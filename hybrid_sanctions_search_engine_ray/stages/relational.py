"""Relational operators Ray Data lacks natively, re-expressed in the
partial-agg / broadcast shapes that survive 100-TB inputs (SURVEY.md
§2.4/§2.5 extras; reference analogue: the ad-hoc pandas/SQL analytics in
its monitoring + screening-decision layers).

* :func:`exact_count_distinct` — COUNT(DISTINCT x) BY key with ONE
  shuffle over the distinct (key, x) pairs (per-batch dedup first, so
  the exchange carries at most the distinct-pair cardinality, never the
  raw rows).
* :func:`broadcast_anti_join` — NOT EXISTS / anti-semi-join: ship the
  key SET once via ``ray.put``, drop matching rows inside
  ``map_batches``. No shuffle; mirrors ``joins.broadcast_join``'s
  small-side assumption (the distinct key set fits a worker heap).
* :func:`rollup` — GROUP BY ROLLUP(k1, k2, ...): the fact table is
  aggregated ONCE at the finest level (partial-agg + small groupby);
  every coarser level is re-aggregated from that already-small fine
  table, so the raw rows shuffle zero times and scan once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

ROLLUP_ALL = "ALL"


def exact_count_distinct(ds, key: str, distinct_col: str):
    """Per-``key`` exact COUNT(DISTINCT distinct_col) + COUNT(*).

    Two-level aggregation: per-batch (key, x) counts → groupby the pair
    (the only shuffle, sized by distinct-pair cardinality) → tiny per-key
    finisher. Exact for any skew; for set cardinalities too large even as
    distinct pairs, use the HLL sketch (``functions/sketches.py``).
    Returns a Dataset with (key, n_distinct:int64, n_rows:int64).
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table({key: b[key], distinct_col: b[distinct_col]})
        # NULL distinct values are excluded from BOTH counts — SQL
        # COUNT(DISTINCT x) / COUNT(x) semantics (a null group would
        # both miscount distincts AND break Ray's sort-based shuffle
        # on the pair key — code-review r05 finding)
        t = t.filter(pc.is_valid(t[distinct_col]))
        g = t.group_by([key, distinct_col]).aggregate([([], "count_all")])
        return g.rename_columns([key, distinct_col, "c_p"])

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, distinct_col])
        .aggregate(Sum("c_p", alias_name="c"))
    )

    def pair_partial(b: pa.Table) -> pa.Table:
        # n_rows = COUNT(distinct_col): rows with a value (see partial)
        g = pa.table({key: b[key], "c": b["c"]}).group_by(key).aggregate(
            [("c", "sum"), ([], "count_all")]
        )
        return g.rename_columns([key, "rows_p", "dist_p"])

    agg = (
        pairs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("dist_p", alias_name="n_distinct"), Sum("rows_p", alias_name="n_rows"))
    )
    return agg


class _AntiJoiner:
    def __init__(self, keys_ref, on: str):
        import pyarrow.compute as pc  # noqa: F401

        self.keys = ray.get(keys_ref)  # pa.Array of distinct keys
        self.on = on

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[self.on]
        # Arrow is_in maps NULL probes to false; AND with validity so
        # NULL rows are dropped (SQL NOT IN semantics, per docstring).
        mask = pc.and_(pc.invert(pc.is_in(col, value_set=self.keys)), pc.is_valid(col))
        return batch.filter(mask)


def broadcast_anti_join(big_ds, keys: pa.Array, on: str, concurrency: int = 4):
    """Keep rows of ``big_ds`` whose ``on`` value is NOT in ``keys``.

    ``keys`` must be the small side's distinct key set (broadcast once
    via the object store) and must be NULL-FREE: SQL ``NOT IN`` against
    a list containing NULL matches nothing, a semantic a silent filter
    cannot honestly reproduce — refuse loudly instead
    (code-review r05 finding). NULL semantics: NULL probe values are dropped
    — matching SQL ``NOT IN`` against a non-null key list (NULL NOT IN
    (...) is never true).
    """
    if getattr(keys, "null_count", 0):
        raise ValueError(
            "broadcast_anti_join: key set contains NULL — SQL NOT IN "
            "against a NULL-bearing list matches nothing; drop the null "
            "key explicitly to state which semantics you want")
    ref = ray.put(keys)
    return big_ds.map_batches(
        _AntiJoiner,
        fn_constructor_args=(ref, on),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def distinct_keys(ds, on: str) -> pa.Array:
    """Distinct values of one column — the build side of
    :func:`broadcast_anti_join`. Per-batch dedup partials stream back and
    union on the driver with a final Arrow dedup: NO shuffle barrier.
    Driver memory is bounded by Σ per-batch distinct counts, fine exactly
    when the key set qualifies as a broadcast small side at all; if the
    per-batch partials themselves are huge, a groupby-based distinct (one
    shuffle) is the escalation."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({on: b[on]}).group_by(on).aggregate([])

    dist = ds.map_batches(partial, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [ray.get(r) for r in dist.to_arrow_refs()], promote_options="default"
    )
    return pc.unique(tbl[on].combine_chunks())


def rollup(ds, keys: list[str], value_col: str, all_label: str = ROLLUP_ALL):
    """GROUP BY ROLLUP(*keys): sum(value_col) + count(*) at every rollup
    level (finest → grand total), with coarser levels' key columns filled
    with ``all_label``.

    The fact table is scanned once and aggregated at the finest level
    (partial per batch → small groupby); coarser levels re-aggregate the
    FINE table, which is already cardinality-bounded — so each extra
    level costs a pandas groupby over a small frame, not another pass
    over the data. Key columns must be strings (the fill label shares
    the column type). Returns a Dataset with (keys..., sum_value:double,
    n_rows:int64).
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        cols = {k: b[k] for k in keys}
        cols[value_col] = b[value_col]
        g = pa.table(cols).group_by(keys).aggregate([(value_col, "sum"), ([], "count_all")])
        return g.rename_columns([*keys, "sum_p", "n_p"])

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("sum_p", alias_name="sum_value"), Sum("n_p", alias_name="n_rows"))
    )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        levels = [df[[*keys, "sum_value", "n_rows"]]]
        for depth in range(len(keys) - 1, -1, -1):
            kept = keys[:depth]
            if kept:
                g = df.groupby(kept, sort=False, as_index=False).agg(
                    sum_value=("sum_value", "sum"), n_rows=("n_rows", "sum")
                )
            else:
                g = pd.DataFrame(
                    {"sum_value": [df["sum_value"].sum()], "n_rows": [df["n_rows"].sum()]}
                )
            for k in keys[depth:]:
                g[k] = all_label
            levels.append(g[[*keys, "sum_value", "n_rows"]])
        out = pd.concat(levels, ignore_index=True)
        out["n_rows"] = out["n_rows"].astype(np.int64)
        return out

    # The fine aggregate is small by construction; repartition(1) makes
    # the rollup expansion see ALL fine rows (coarser levels must sum
    # across every fine group, so this one stage is a deliberate barrier
    # over the tiny aggregate — never over the fact table).
    return fine.repartition(1).map_batches(expand, batch_format="pandas", batch_size=None)


def global_topn(ds, by: list[tuple[str, bool]], n: int):
    """Global top-N WITHOUT a global sort: per-batch partial top-N (each
    block contributes at most n rows) → one small merge task. ``by`` is
    [(column, ascending)] and must define a total order (include
    tie-breaker columns) for deterministic output. At extreme block
    counts the merge input is blocks×n rows — still tiny next to the
    data, but a two-level merge (repartition(16) → repartition(1)) is
    the drop-in escalation if it ever isn't."""
    cols = [c for c, _ in by]
    asc = [a for _, a in by]

    def take(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(cols, ascending=asc, kind="mergesort").head(n)

    return (
        ds.map_batches(take, batch_format="pandas")
        .repartition(1)
        .map_batches(take, batch_format="pandas", batch_size=None)
    )


def composite_pages(ds, keys: list[str], page_size: int, text_col: str = "text") -> pd.DataFrame:
    """ES ``composite`` aggregation with after-key paging: buckets are
    the distinct key tuples in ascending key order; each page of
    ``page_size`` buckets starts right after the previous page's last
    key (the ``after`` cursor). The engine aggregates ONCE — per-batch
    Arrow group_by partials, one small shuffle over the bucket keys —
    and pages the already-tiny ordered bucket list; a paging client
    re-reading page N never re-scans the corpus. Per bucket: row count
    and Σ codepoint length of ``text_col`` (both exact ints).
    Returns a pandas frame (bucket-count-sized) with a ``page`` column.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {**{k: b[k] for k in keys},
             "chars": pc.cast(pc.utf8_length(pc.fill_null(b[text_col], "")), pa.int64())}
        )
        g = t.group_by(keys).aggregate([("chars", "sum"), ([], "count_all")])
        return g.rename_columns([*keys, "chars_p", "rows_p"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("rows_p", alias_name="n_rows"), Sum("chars_p", alias_name="sum_chars"))
    )
    df = agg.to_pandas().sort_values(keys, kind="mergesort").reset_index(drop=True)
    df["page"] = (np.arange(len(df)) // page_size + 1).astype(np.int32)
    df["n_rows"] = df["n_rows"].astype(np.int64)
    df["sum_chars"] = df["sum_chars"].astype(np.int64)
    return df


def percentile_ranks(ds, key: str, value_col: str, thresholds: list[float]) -> pd.DataFrame:
    """ES ``percentile_ranks`` aggregation, exact: per ``key``, the
    fraction of rows with ``value <= threshold`` for each threshold.
    One streaming pass — per-batch Arrow partials carry (key,
    n_le_t..., n) integer counts, the only shuffle is the tiny per-key
    groupby, and the division happens once on the bucket-sized result.
    Returns a pandas frame: key, n_rows, pr_<i> (round-6 fractions)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away

    names = [f"le{i}" for i in range(len(thresholds))]

    def partial(b: pa.Table) -> pa.Table:
        cols = {key: b[key]}
        for nm, th in zip(names, thresholds):
            cols[nm] = pc.cast(pc.less_equal(b[value_col], th), pa.int64())
        # denominator counts NON-NULL values (ES percentile_ranks skips
        # docs missing the field; count_all understated every fraction
        # on nullable columns — code-review r05 finding)
        if pa.types.is_null(b[value_col].type):
            return pa.table({key: pa.array([], b[key].type),
                             **{f"{nm}_p": pa.array([], pa.int64())
                                for nm in names},
                             "n_p": pa.array([], pa.int64())})
        cols["nv"] = pc.cast(pc.is_valid(b[value_col]), pa.int64())
        t = pa.table(cols)
        g = t.group_by([key]).aggregate([(nm, "sum") for nm in names] + [("nv", "sum")])
        return g.rename_columns([key, *[f"{nm}_p" for nm in names], "n_p"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(*[Sum(f"{nm}_p", alias_name=nm) for nm in names],
                   Sum("n_p", alias_name="n_rows"))
    )
    df = agg.to_pandas().sort_values(key, kind="mergesort").reset_index(drop=True)
    n = df["n_rows"].to_numpy(dtype=np.float64)
    out = {key: df[key], "n_rows": df["n_rows"].astype(np.int64)}
    for i, nm in enumerate(names):
        out[f"pr_{i}"] = round_half_away(df[nm].to_numpy(dtype=np.float64) / n, 6)
    return pd.DataFrame(out)


def pack_bins(ds, cfg, budget: int = 256, range_size: int = 1024) -> "ray.data.Dataset":
    """Sequence packing for training batches: assign each document (in
    doc_id order) to the pack whose token budget its PRECEDING documents
    fill — ``pack_id = tokens_before // budget`` — so packs are
    contiguous doc runs of ≈``budget`` tokens (token-less docs are
    skipped, as nothing of them reaches a sequence).

    This is a DISTRIBUTED PREFIX SUM, the pattern every order-dependent
    assignment needs at scale: (1) tokenize once into (doc_id, n_tokens)
    pairs — ~16 bytes/doc, orders of magnitude under corpus bytes, so
    materializing them is safe where the corpus itself never would be;
    (2) per-range partial sums (range = doc_id // range_size) shuffle a
    RANGE-count-sized table to the driver, which builds exclusive
    offsets; (3) one groupby(range) pass cumsums within each range
    against the broadcast offset. Raw text shuffles zero times.
    Returns a Dataset of (doc_id, n_tokens, pack_id)."""
    from ray.data.aggregate import Sum

    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    def counts(b: pa.Table) -> pa.Table:
        parent, _terms = flat_terms(b, cfg)
        if parent.size == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "rng": pa.array([], pa.int64())})
        starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
        n = np.diff(np.r_[starts, parent.size])
        ids = b["doc_id"].to_numpy(zero_copy_only=False)[parent[starts]]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n, pa.int64()),
                         "rng": pa.array(ids // range_size, pa.int64())})

    pairs = ds.map_batches(counts, batch_format="pyarrow").materialize()

    def rng_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"rng": b["rng"], "n": b["n_tokens"]}).group_by("rng").aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["rng", "n_p"])

    totals = (
        pairs.map_batches(rng_partial, batch_format="pyarrow")
        .groupby("rng")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
        .sort_values("rng", kind="mergesort")
    )
    rngs = totals["rng"].to_numpy(dtype=np.int64)
    offsets = np.r_[0, np.cumsum(totals["n"].to_numpy(dtype=np.int64))][:-1]
    off_ref = ray.put({"rngs": rngs, "offsets": offsets})

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(off_ref)
        g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        base = o["offsets"][int(np.searchsorted(o["rngs"], int(g["rng"].iloc[0])))]
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        before = base + np.cumsum(n) - n
        return pd.DataFrame({"doc_id": g["doc_id"].astype(np.int64),
                             "n_tokens": g["n_tokens"].astype(np.int64),
                             "pack_id": (before // budget).astype(np.int64)})

    return pairs.groupby("rng").map_groups(assign, batch_format="pandas")


def extended_stats(ds, key: str, value_col: str) -> pd.DataFrame:
    """ES ``extended_stats`` aggregation, EXACT: per ``key`` the count,
    sum, min, max, mean and population variance of an integral-valued
    column. The streaming pass carries only integer sufficient
    statistics (n, Σx, Σx², min, max — cast to int64, so partial sums
    are order-independent and exact); mean and variance derive from the
    exact integers once, with one shared float expression
    (``(Σx² − (Σx)²/n)/n``) — no float accumulation over rows, which is
    what makes the result reproducible across any partitioning.
    The caller guarantees values are integral (casting is checked)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away

    def partial(b: pa.Table) -> pa.Table:
        if pa.types.is_null(b[value_col].type):
            # an all-null block arrives null-TYPED; no values to count
            return pa.table({key: pa.array([], b[key].type),
                             "s_p": pa.array([], pa.int64()),
                             "sq_p": pa.array([], pa.int64()),
                             "mn_p": pa.array([], pa.int64()),
                             "mx_p": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64())})
        v = pc.cast(b[value_col], pa.int64())
        # pc.all over an all-null comparison is a NULL scalar, not False —
        # `not None` fired a bogus integrality error (code-review r05)
        ok = pc.all(pc.equal(pc.cast(v, b[value_col].type), b[value_col])).as_py()
        if ok is False:
            raise ValueError(f"{value_col} has non-integral values; extended_stats "
                             "is exact only over integers")
        # checked multiply: x² overflow raises loudly instead of wrapping.
        # n counts NON-NULL values (ES extended_stats skips missing;
        # count_all over null rows inflated the denominator while the
        # sums skipped them — code-review r05 finding)
        t = pa.table({key: b[key], "x": v, "x2": pc.multiply_checked(v, v)})
        g = t.group_by([key]).aggregate(
            [("x", "sum"), ("x2", "sum"), ("x", "min"), ("x", "max"), ("x", "count")]
        )
        return g.rename_columns([key, "s_p", "sq_p", "mn_p", "mx_p", "n_p"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("s_p", alias_name="sum_v"), Sum("sq_p", alias_name="sumsq"),
                   Min("mn_p", alias_name="min_v"), Max("mx_p", alias_name="max_v"),
                   Sum("n_p", alias_name="n_rows"))
    )
    df = agg.to_pandas().sort_values(key, kind="mergesort").reset_index(drop=True)
    n = df["n_rows"].to_numpy(dtype=np.int64)
    s = df["sum_v"].to_numpy(dtype=np.int64)
    sq = df["sumsq"].to_numpy(dtype=np.int64)
    # s² via arbitrary-precision Python ints (bucket-count-sized loop):
    # an int64 s*s would wrap silently past Σx ≈ 3e9, and DuckDB computes
    # the exact wide product before its float division — this matches it
    # bit-for-bit at any magnitude
    s2 = np.array([float(int(x) * int(x)) for x in s], dtype=np.float64)
    return pd.DataFrame(
        {
            key: df[key],
            "n_rows": n,
            "sum_v": s,
            "min_v": df["min_v"].astype(np.int64),
            "max_v": df["max_v"].astype(np.int64),
            "avg_v": round_half_away(s / n, 6),
            "var_v": round_half_away((sq - s2 / n) / n, 6),
        }
    )


def pivot_table(ds, row_key: str, col_expr, col_names: list[str],
                prefix: str = "c") -> pd.DataFrame:
    """Wide reshape: count pivot of ``row_key`` × a derived integer
    column index (``col_expr``: pyarrow.Table → int64 numpy array in
    ``[0, len(col_names))``). Per-batch (row, col) count partials →
    ONE small shuffle → a bucket-sized driver pivot; the corpus never
    moves. Output columns: ``row_key, {prefix}_<name>...`` — absent
    cells are 0."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        col = col_expr(b)
        g = pa.table({row_key: b[row_key], "col": pa.array(col, pa.int64())}).group_by(
            [row_key, "col"]
        ).aggregate([([], "count_all")])
        return g.rename_columns([row_key, "col", "c_p"])

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([row_key, "col"])
        .aggregate(Sum("c_p", alias_name="n"))
        .to_pandas()
    )
    cols = [f"{prefix}_{n}" for n in col_names]
    if df.empty:
        return pd.DataFrame({row_key: pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64) for c in cols}})
    wide = df.pivot_table(index=row_key, columns="col", values="n",
                          aggfunc="sum", fill_value=0)
    wide = wide.reindex(columns=range(len(col_names)), fill_value=0)
    wide.columns = cols
    wide = wide.reset_index().sort_values(row_key, kind="mergesort").reset_index(drop=True)
    for c in cols:
        wide[c] = wide[c].astype(np.int64)
    return wide
