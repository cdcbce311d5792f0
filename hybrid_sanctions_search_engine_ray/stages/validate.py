"""Input validation / sanitization stage.

Reference parity (reference: src/ai_service/utils/input_validation.py:
125-210 — SURVEY.md §2.2 M1): length cap (default 10 000 chars,
``:32``), empty/whitespace rejection, control-character strip,
truncate-don't-raise policy. Re-expressed as one vectorized
``map_batches`` function that annotates rather than throws — a batch
engine quarantines bad rows instead of failing a request.

Output adds: ``valid:bool``, ``truncated:bool``, ``reject_reason``
(empty string when valid). Use :func:`clean` to drop-and-truncate in
one step (the smart-filter skip-empty path, SURVEY.md §2.2 M2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_LEN = 10_000  # reference input_validation.py:32


def validate_batch(batch: pa.Table, max_len: int = MAX_LEN, text_col: str = "text") -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lengths = pc.utf8_length(text)
    trimmed = pc.utf8_trim_whitespace(text)
    is_empty = pc.or_(pc.is_null(text), pc.equal(pc.utf8_length(trimmed), 0))
    too_long = pc.greater(lengths, max_len)
    valid = pc.invert(is_empty)
    reason = pc.if_else(is_empty, "empty", "")
    return (
        batch.append_column("valid", valid)
        .append_column("truncated", too_long)
        .append_column("reject_reason", reason)
    )


# control characters to strip (keep \t \n \r; strip the rest of C0 + DEL)
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def clean(ds, max_len: int = MAX_LEN, text_col: str = "text"):
    """Drop empty rows, strip control chars, truncate over-long text —
    the lenient sanitize path (no row ever raises). Fully vectorized:
    Arrow regex replace + slice, no per-row Python."""

    def fn(batch: pa.Table) -> pa.Table:
        b = validate_batch(batch, max_len, text_col)
        b = b.filter(b["valid"])
        text = b[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        cleaned = pc.utf8_slice_codeunits(
            pc.replace_substring_regex(text, _CONTROL_RE, ""), 0, max_len
        )
        i = b.column_names.index(text_col)
        b = b.set_column(i, text_col, cleaned)
        # control-only text becomes empty AFTER the strip — re-apply the
        # drop-empty contract (code-review r05 finding)
        b = b.filter(pc.greater(
            pc.utf8_length(pc.utf8_trim_whitespace(b[text_col])), 0))
        return b.drop_columns(["valid", "truncated", "reject_reason"])

    return ds.map_batches(fn, batch_format="pyarrow")


# --- smart pre-filter (reference M2) -----------------------------------------
# Signal regexes shared verbatim with the driver's SQL oracle (both RE2):
# the reference's smart filter decides "does this text need full search
# processing" from name/company/payment-context signals plus exclusion
# rules (reference: src/ai_service/layers/smart_filter/
# smart_filter_service.py:123-260 — name/company detectors, payment
# context, date-only and empty exclusions, weighted confidence).
SMART_NAME_RE = r"[A-ZА-ЯЁІЇЄ][a-zа-яёіїє]+ [A-ZА-ЯЁІЇЄ][a-zа-яёіїє]+"
# NOTE: RE2's \b is ASCII-only — it can never delimit Cyrillic words —
# so word boundaries are explicit non-letter/digit classes (RE2 and
# DuckDB agree on \p{L}\p{N}).
_B = r"(^|[^\p{L}\p{N}])", r"([^\p{L}\p{N}]|$)"
SMART_COMPANY_RE = _B[0] + r"(llc|ltd|inc|corp|gmbh|bank|ооо|тов)" + _B[1]
SMART_CONTEXT_RE = _B[0] + r"(payment|transfer|invoice|order|customer|оплата|платеж)" + _B[1]
SMART_DATE_ONLY_RE = r"^[\d\s.,/:\-]+$"
# weighted confidence (reference confidence_scorer shape: names dominate)
_W_NAME, _W_COMPANY, _W_CONTEXT = 0.4, 0.3, 0.3


def smart_prefilter(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized smart pre-filter: per-row boolean signals → weighted
    confidence → ``should_process`` decision. Pure Arrow RE2 kernels
    (four ``match_substring_regex`` sweeps per batch, no per-row
    Python); exactly mirrored by the ``smart_prefilter`` oracle SQL.

    Adds: ``name_signal``, ``company_signal``, ``context_signal``
    (bools), ``confidence`` (double, round-4), ``should_process``
    (false for empty/date-only text or zero confidence)."""
    raw = batch[text_col]
    if isinstance(raw, pa.ChunkedArray):
        raw = raw.combine_chunks()
    text = pc.fill_null(raw, "")  # null text scores like empty text
    lower = pc.utf8_lower(text)
    name_sig = pc.match_substring_regex(text, SMART_NAME_RE)
    company_sig = pc.match_substring_regex(lower, SMART_COMPANY_RE)
    context_sig = pc.match_substring_regex(lower, SMART_CONTEXT_RE)
    date_only = pc.match_substring_regex(text, SMART_DATE_ONLY_RE)
    trimmed = pc.utf8_trim_whitespace(text)
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    n = name_sig.to_numpy(zero_copy_only=False).astype(np.float64)
    c = company_sig.to_numpy(zero_copy_only=False).astype(np.float64)
    x = context_sig.to_numpy(zero_copy_only=False).astype(np.float64)
    conf = np.round(_W_NAME * n + _W_COMPANY * c + _W_CONTEXT * x, 4)
    excluded = pc.or_(date_only, empty).to_numpy(zero_copy_only=False)
    should = (~excluded) & (conf > 0.0)
    return (
        batch.append_column("name_signal", name_sig)
        .append_column("company_signal", company_sig)
        .append_column("context_signal", context_sig)
        .append_column("confidence", pa.array(conf, pa.float64()))
        .append_column("should_process", pa.array(should))
    )


def k_anonymity_audit(ds, quasi_cols: list[str], ks: list[int]):
    """k-anonymity audit (Sweeney 2002) over a quasi-identifier
    combination: rows whose equivalence class (identical quasi-id
    tuple) has fewer than k members are re-identifiable at that k. The
    data-governance gate a corpus passes before release — the
    structural complement of content-level PII redaction
    (stages/redact.py).

    One class-keyed exchange of per-batch partial counts (classes-sized,
    never row-sized); the per-k report is computed on the driver from
    the class table. Returns one row per k:
    (k, n_classes, n_classes_at_risk, n_rows_at_risk, risk_frac round4).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(quasi_cols)
        g = t.group_by(quasi_cols).aggregate([([], "count_all")])
        return g.rename_columns(quasi_cols + ["c_p"])

    classes = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(quasi_cols)
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
    )
    c = classes["c"].to_numpy(np.int64)
    total = int(c.sum())
    rows = []
    for k in ks:
        risk = c < k
        n_rows = int(c[risk].sum())
        frac = 0.0 if total == 0 else \
            float(np.floor(n_rows / total * 1e4 + 0.5) / 1e4)
        rows.append((int(k), len(c), int(risk.sum()), n_rows, frac))
    return pd.DataFrame(rows, columns=["k", "n_classes", "n_classes_at_risk",
                                       "n_rows_at_risk", "risk_frac"]).astype(
        {"k": np.int64, "n_classes": np.int64, "n_classes_at_risk": np.int64,
         "n_rows_at_risk": np.int64})


def l_diversity_audit(ds, quasi_cols: list[str], sensitive_col: str,
                      ls: list[int]):
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    companion: an equivalence class is l-diverse if it contains at
    least l DISTINCT sensitive values; homogeneous classes leak the
    sensitive attribute even when k-anonymous. One (class, sensitive)-
    keyed exchange of distinct pairs; per-l report like the k-audit."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(quasi_cols + [sensitive_col])
        g = t.group_by(quasi_cols + [sensitive_col]).aggregate([([], "count_all")])
        return g.rename_columns(quasi_cols + [sensitive_col, "c_p"])

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(quasi_cols + [sensitive_col])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
    )
    # dropna=False: a null-quasi equivalence class is still a class —
    # k_anonymity_audit counts it, and dropping it here underreports a
    # homogeneous leaking class (code-review r05 finding)
    grp = pairs.groupby(quasi_cols, sort=False, dropna=False).agg(
        n_distinct=(sensitive_col, "nunique"), n_rows=("c", "sum"))
    nd = grp["n_distinct"].to_numpy(np.int64)
    nr = grp["n_rows"].to_numpy(np.int64)
    total = int(nr.sum())
    rows = []
    for l in ls:
        risk = nd < l
        n_rows = int(nr[risk].sum())
        frac = 0.0 if total == 0 else \
            float(np.floor(n_rows / total * 1e4 + 0.5) / 1e4)
        rows.append((int(l), len(nd), int(risk.sum()), n_rows, frac))
    return pd.DataFrame(rows, columns=["l", "n_classes", "n_classes_at_risk",
                                       "n_rows_at_risk", "risk_frac"]).astype(
        {"l": np.int64, "n_classes": np.int64, "n_classes_at_risk": np.int64,
         "n_rows_at_risk": np.int64})
