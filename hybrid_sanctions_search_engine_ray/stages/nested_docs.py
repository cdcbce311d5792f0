"""ES nested-document family: the ``nested`` query and the ``nested`` /
``reverse_nested`` aggregations.

Elasticsearch nested docs exist to make a conjunction apply to ONE
member of an array-of-objects field rather than to the flattened union
of all members (the "cross-object match" pitfall its docs warn about).
The test tables carry the same parent/child shape relationally: each
``events`` row is a nested doc under its ``user_id`` parent, mirroring
how the reference's ES templates nest ``metadata`` objects under a
sanction entity (reference: elasticsearch_index_manager.py:146-158 —
the nested-capable ``metadata`` mapping; the reference itself queries
them flattened, so the per-nested-doc conjunction is part of the
engine-completeness axis).

Semantics implemented:

* ``nested_query``: parents having >= ``min_children`` nested docs that
  satisfy ALL leaf predicates simultaneously (event_type equality AND a
  value range on the SAME event row). ES scores the parent from the
  matching children per ``score_mode``; the deterministic analogs here
  are the matching-child count plus the exact-cents max/sum of the
  matched values.
* ``nested_terms_agg``: a terms aggregation INSIDE ``nested`` scope
  (bucket key = nested-doc field) with a ``reverse_nested`` sub-agg
  (how many PARENTS have at least one matching nested doc in the
  bucket) — the canonical nested/reverse_nested pairing from the ES
  docs.

Scale shape: both are one streaming pass over the child table.
``nested_query`` shuffles (parent, partials) — parents, never raw rows.
``nested_terms_agg`` shuffles per-batch-distinct (key, parent) pairs,
the standard exact distinct-count exchange; bucket keys are
low-cardinality so the final reduce is tiny.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _cents(v: np.ndarray) -> np.ndarray:
    """Exact integer cents — delegates to the repo-wide single kernel
    (textops.exact_cents operates on Arrow arrays; this numpy shim keeps
    the two from drifting — code-review r05 finding)."""
    from hybrid_sanctions_search_engine_ray.stages.textops import exact_cents

    return exact_cents(pa.array(v, pa.float64())).to_numpy(zero_copy_only=False)


def nested_query(ds, parent_col: str, type_col: str, type_value: str,
                 value_col: str, lo: float, hi: float,
                 min_children: int = 1) -> pd.DataFrame:
    """Parents with >= ``min_children`` child rows where
    ``type_col == type_value AND lo <= value_col < hi`` — the per-nested-doc
    conjunction. Returns (parent, n_matched, max_value, sum_value) sorted by
    (n_matched desc, parent asc); value stats are exact-cents arithmetic.
    """
    from ray.data.aggregate import Max, Sum

    def partial(b: pa.Table) -> pa.Table:
        et = b[type_col].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False)
        keep = (et == type_value) & (v >= lo) & (v < hi)
        if not keep.any():
            return pa.table({parent_col: pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64()),
                             "mx_p": pa.array([], pa.int64()),
                             "sm_p": pa.array([], pa.int64())})
        p = b[parent_col].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        c = _cents(v[keep])
        g = pd.DataFrame({parent_col: p, "c": c}).groupby(parent_col, sort=False)["c"] \
              .agg(n_p="size", mx_p="max", sm_p="sum").reset_index()
        return pa.Table.from_pandas(g.astype(np.int64), preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(parent_col)
        .aggregate(Sum("n_p", alias_name="n_matched"),
                   Max("mx_p", alias_name="mx"),
                   Sum("sm_p", alias_name="sm"))
        .to_pandas()
    )
    if not agg.empty:
        agg = agg[agg["n_matched"] >= min_children]
    if agg.empty:
        return pd.DataFrame({parent_col: pd.Series([], dtype=np.int64),
                             "n_matched": pd.Series([], dtype=np.int64),
                             "max_value": pd.Series([], dtype=float),
                             "sum_value": pd.Series([], dtype=float)})
    agg = agg.sort_values(["n_matched", parent_col], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({
        parent_col: agg[parent_col].astype(np.int64),
        "n_matched": agg["n_matched"].astype(np.int64),
        "max_value": agg["mx"].to_numpy(dtype=np.int64) / 100.0,
        "sum_value": agg["sm"].to_numpy(dtype=np.int64) / 100.0,
    })


def nested_terms_agg(ds, parent_col: str, key_col: str,
                     value_col: str, min_value: float) -> pd.DataFrame:
    """Terms agg in nested scope + reverse_nested: among child rows with
    ``value_col >= min_value``, per ``key_col`` bucket report the nested
    doc_count and the distinct-parent count (``reverse_nested``).
    Returns (key, doc_count, parent_count) ordered by
    (doc_count desc, key asc) — the ES terms order."""
    from ray.data.aggregate import Sum

    def pairs(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        keep = v >= min_value
        t = pa.table({key_col: pc.array_filter(b[key_col], pa.array(keep)),
                      parent_col: pc.array_filter(b[parent_col], pa.array(keep))})
        g = t.group_by([key_col, parent_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, parent_col, "c_p"])

    uniq = (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=16384)
        .groupby([key_col, parent_col])
        .aggregate(Sum("c_p", alias_name="c"))
    )

    def finish_partial(b: pa.Table) -> pa.Table:
        # rows here are globally-unique (key, parent) pairs with exact
        # child counts — fold to per-key partials before the tiny reduce
        df = pd.DataFrame({key_col: b[key_col].to_pandas(),
                           "c": b["c"].to_numpy(zero_copy_only=False)})
        g = df.groupby(key_col, sort=False)["c"].agg(dc_p="sum", pc_p="size").reset_index()
        g["dc_p"] = g["dc_p"].astype(np.int64)
        g["pc_p"] = g["pc_p"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        uniq.map_batches(finish_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("dc_p", alias_name="doc_count"),
                   Sum("pc_p", alias_name="parent_count"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "doc_count": pd.Series([], dtype=np.int64),
                             "parent_count": pd.Series([], dtype=np.int64)})
    agg = agg.sort_values(["doc_count", key_col], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({key_col: agg[key_col],
                         "doc_count": agg["doc_count"].astype(np.int64),
                         "parent_count": agg["parent_count"].astype(np.int64)})
