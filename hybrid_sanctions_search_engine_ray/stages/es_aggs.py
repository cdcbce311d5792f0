"""ES aggregation family — the metric / bucket / pipeline aggregations
the reference's ES tier exposes that were not yet first-class operators
here (reference aggregation usage: elasticsearch_adapters.py query
assembly; the ES agg names follow the public API): ``boxplot``,
``median_absolute_deviation``, ``weighted_avg``, ``t_test`` (Welch),
``multi_terms``, ``range``, ``filters``, and the
``bucket_script`` / ``bucket_selector`` / ``bucket_sort`` pipeline aggs.

Every operator follows the partial-aggregation shape that scales to a
multi-node cluster: a vectorized per-batch partial inside
``map_batches`` → ONE small shuffle over keys/buckets (never the raw
rows) → a bucket-sized finisher. Nothing here materializes the corpus;
driver-side work is O(#buckets).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from hybrid_sanctions_search_engine_ray.stages.quantiles import hist_counts, interp_from_hist

_Q_BOX = [
    ("v_min", Fraction(0)),
    ("q1", Fraction(1, 4)),
    ("q2", Fraction(1, 2)),
    ("q3", Fraction(3, 4)),
    ("v_max", Fraction(1)),
]


def boxplot(ds, key: str, col: str):
    """ES ``boxplot`` aggregation, exact: per key the five-number summary
    (min, q1, median, q3, max) with percentile_cont interpolation — the
    deterministic twin of ES's TDigest approximation. Same value-histogram
    shuffle as the quantile operators; raw rows never move."""
    counts = hist_counts(ds, key, col)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col, kind="mergesort")
        cum = g["c"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        vals = g[col].to_numpy(dtype=np.float64)
        row = {key: g[key].iloc[0]}
        for name, frac in _Q_BOX:
            row[name] = interp_from_hist(vals, cum, n, frac)
        return pd.DataFrame([row])

    return counts.groupby(key).map_groups(finish, batch_format="pandas")


def grouped_mad(ds, key: str, col: str):
    """ES ``median_absolute_deviation``, exact two-pass:
    ``median(|x - median(x)|)`` per key. Pass 1 computes per-key medians
    (histogram shuffle); the key→median map (O(#keys), tiny) rides into a
    second vectorized pass that derives ``|x - m|`` per row; pass 2 is the
    same histogram shuffle over the deviations. ES approximates this with
    TDigest — this is the deterministic exact form."""
    from hybrid_sanctions_search_engine_ray.stages.quantiles import grouped_interp_quantiles

    med_df = grouped_interp_quantiles(ds, key, col, [0.5]).to_pandas()
    med = dict(zip(med_df[key], med_df["value"]))

    def dev(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = pd.Series(k).map(med).to_numpy(dtype=np.float64)
        return pa.table({key: b[key], "absdev": pa.array(np.abs(v - m), pa.float64())})

    devs = ds.map_batches(dev, batch_format="pyarrow")
    out = grouped_interp_quantiles(devs, key, "absdev", [0.5])
    return out.map_batches(
        lambda b: b.select([key, "value"]).rename_columns([key, "mad"]),
        batch_format="pyarrow",
    )


def weighted_avg(ds, key: str, value_col: str, weight_col: str):
    """ES ``weighted_avg``: sum(v·w)/sum(w) per key — per-batch float
    partials, one tiny shuffle, one division on the bucket-sized result."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({key: b[key], "vw": pa.array(v * w), "w": pa.array(w)})
        return t.group_by(key).aggregate([("vw", "sum"), ("w", "sum")])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("vw_sum", alias_name="s_vw"), Sum("w_sum", alias_name="s_w"))
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: b[key],
                "weighted_avg": b["s_vw"].to_numpy() / b["s_w"].to_numpy(),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def welch_t_test(ds, key: str, col: str, group_a, group_b) -> pd.DataFrame:
    """ES ``t_test`` (type=heteroscedastic / Welch): the t statistic
    between two key groups from per-group sufficient statistics
    (n, Σx, Σx²) — one streaming scan, a 2-row shuffle, the closed-form
    finisher on the driver. Sample variance uses the explicit
    ``(Σx² − (Σx)²/n)/(n−1)`` form (the oracle SQL shares it verbatim so
    engine and SQL differ only by float summation order)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[key], value_set=pa.array([group_a, group_b]))
        t = b.filter(mask)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        g = pa.table(
            {key: t[key], "n": pa.array(np.ones(len(t), np.int64)),
             "s": pa.array(v), "sq": pa.array(v * v)}
        )
        return g.group_by(key).aggregate([("n", "sum"), ("s", "sum"), ("sq", "sum")])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("n_sum", alias_name="n"), Sum("s_sum", alias_name="s"),
                   Sum("sq_sum", alias_name="sq"))
        .to_pandas()
    )
    stats = {}
    for _, r in agg.iterrows():
        n, s, sq = int(r["n"]), float(r["s"]), float(r["sq"])
        if n < 2:
            raise ValueError(f"t_test group {r[key]!r} has {n} row(s); needs >= 2")
        mean = s / n
        var = (sq - s * s / n) / (n - 1)
        stats[r[key]] = (n, mean, var)
    for g in (group_a, group_b):
        if g not in stats:
            raise ValueError(f"t_test group {g!r} not present in column {key!r}")
    na, ma, va = stats[group_a]
    nb, mb, vb = stats[group_b]
    # float cancellation in (sq - s²/n) can drive an exact-zero variance
    # a hair negative; constant groups make the pooled SE exactly 0 —
    # clamp and report NaN instead of crashing (code-review r05 finding)
    va, vb = max(va, 0.0), max(vb, 0.0)
    se2 = va / na + vb / nb
    if se2 == 0.0:
        t_stat = float("nan")
        dof = float("nan")
    else:
        t_stat = (ma - mb) / math.sqrt(se2)
        # Welch–Satterthwaite degrees of freedom (reported, not rounded away)
        dof = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return pd.DataFrame(
        [{
            "group_a": group_a, "group_b": group_b,
            "n_a": na, "n_b": nb,
            "mean_a": ma, "mean_b": mb,
            "t_stat": t_stat, "dof": dof,
        }]
    )


def multi_terms(ds, keys: list[str], size: int):
    """ES ``multi_terms``: top-``size`` compound-key buckets by doc count
    (count desc, then keys ascending — ES's deterministic tie order).
    Per-batch compound-key count partials → small shuffle → global top-N
    on the bucket-sized result."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns([*keys, "c_p"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("c_p", alias_name="doc_count"))
    )

    def top(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["doc_count", *keys], ascending=[False] + [True] * len(keys),
                          kind="mergesort").head(size)
        return b.reset_index(drop=True)

    # bucket-count-sized: one final take on the driver is fine
    df = agg.to_pandas()
    if df.empty:  # empty Dataset → to_pandas() drops columns; restore them
        return pd.DataFrame({**{k: pd.Series([], dtype=object) for k in keys},
                             "doc_count": pd.Series([], dtype=np.int64)})
    out = top(df)
    out["doc_count"] = out["doc_count"].astype(np.int64)
    return out


def range_agg(ds, col: str, edges: list[float], key: str | None = None):
    """ES ``range`` aggregation: half-open value buckets
    ``(-inf, e0), [e0, e1), ..., [e_last, inf)`` with per-bucket count /
    sum / avg. One vectorized ``np.digitize`` partial per batch, a
    buckets-sized shuffle."""
    from ray.data.aggregate import Sum

    e = np.asarray(edges, dtype=np.float64)

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]  # ES skips missing values; NaN would land
        # in the top bucket and poison its sum (code-review r05 finding)
        idx = np.digitize(v, e)  # 0 = below e0, len(e) = above last
        t = pa.table(
            {"bucket": pa.array(idx.astype(np.int32)),
             "n": pa.array(np.ones(v.size, np.int64)),
             "s": pa.array(v)}
        )
        return t.group_by("bucket").aggregate([("n", "sum"), ("s", "sum")])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_sum", alias_name="doc_count"), Sum("s_sum", alias_name="v_sum"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int32),
                             "range_from": pd.Series([], dtype=np.float64),
                             "range_to": pd.Series([], dtype=np.float64),
                             "doc_count": pd.Series([], dtype=np.int64),
                             "v_sum": pd.Series([], dtype=np.float64),
                             "v_avg": pd.Series([], dtype=np.float64)})
    agg = agg.sort_values("bucket", kind="mergesort").reset_index(drop=True)
    lo = [None, *e.tolist()]
    hi = [*e.tolist(), None]
    agg["range_from"] = [lo[int(i)] for i in agg["bucket"]]
    agg["range_to"] = [hi[int(i)] for i in agg["bucket"]]
    agg["v_avg"] = agg["v_sum"].to_numpy() / agg["doc_count"].to_numpy()
    agg["doc_count"] = agg["doc_count"].astype(np.int64)
    return agg[["bucket", "range_from", "range_to", "doc_count", "v_sum", "v_avg"]]


def filters_agg(ds, col: str, named_patterns: dict[str, str]):
    """ES ``filters`` aggregation: one named bucket per predicate; a doc
    can land in several buckets (overlap allowed). Patterns are RE2,
    applied vectorized per batch; partial counts shuffle (#names rows)."""
    from ray.data.aggregate import Sum

    names = sorted(named_patterns)

    def partial(b: pa.Table) -> pa.Table:
        rows_n, rows_c = [], []
        for name in names:
            m = pc.match_substring_regex(b[col], named_patterns[name])
            rows_n.append(name)
            rows_c.append(int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0))
        return pa.table({"filter_name": pa.array(rows_n, pa.string()),
                         "doc_count": pa.array(rows_c, pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("filter_name")
        .aggregate(Sum("doc_count", alias_name="doc_count"))
    )


def bucket_pipeline(events_ds, ts_col: str = "ts", bucket_s: int = 86400,
                    value_col: str = "value", min_count: int = 1,
                    top: int = 5) -> pd.DataFrame:
    """The ES pipeline-agg trio over a date_histogram:

    * parent: per-bucket ``doc_count`` + ``sum(value)``;
    * ``bucket_script``: ``avg_value = sum / doc_count``;
    * ``bucket_selector``: keep buckets with ``doc_count >= min_count``;
    * ``bucket_sort``: order by (round4 avg_value desc, bucket asc),
      keep ``top``.

    One streaming scan with integer/float partials; every pipeline stage
    runs vectorized on the series-length-sized driver result. Ordering is
    quantized (round4) so float summation order can never flip ranks
    between engine and SQL oracle."""
    from ray.data.aggregate import Sum

    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away

    div = np.int64(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table(
            {"bucket": pa.array(us // div, pa.int64()),
             "n": pa.array(np.ones(v.size, np.int64)),
             "s": pa.array(v)}
        )
        return t.group_by("bucket").aggregate([("n", "sum"), ("s", "sum")])

    df = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_sum", alias_name="doc_count"), Sum("s_sum", alias_name="v_sum"))
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "doc_count": pd.Series([], dtype=np.int64),
                             "avg_value": pd.Series([], dtype=np.float64)})
    df = df[df["doc_count"] >= min_count].copy()           # bucket_selector
    df["avg_value"] = round_half_away(                      # bucket_script
        df["v_sum"].to_numpy() / df["doc_count"].to_numpy(), 4
    )
    df = df.sort_values(["avg_value", "bucket"], ascending=[False, True],
                        kind="mergesort").head(top)         # bucket_sort
    df = df.reset_index(drop=True)
    df["doc_count"] = df["doc_count"].astype(np.int64)
    return df[["bucket", "doc_count", "avg_value"]]


def scripted_metric(ds, key: str, map_script, state: dict[str, str], reduce_script):
    """ES ``scripted_metric`` aggregation: user code at both ends of the
    partial-aggregation contract. ``map_script(batch: pa.Table) ->
    pa.Table`` emits per-batch partial state rows ``[key, *state]``;
    ``state`` declares how each column merges across batches/partitions
    ('sum' | 'min' | 'max' — the mergeable-state requirement ES's
    combine_script fills with user code; here it is declared so the
    merge can run as a Ray groupby aggregate, never on the driver);
    ``reduce_script(df: pd.DataFrame) -> pd.DataFrame`` turns merged
    state into result columns. The shuffle carries only state rows."""
    from ray.data.aggregate import Max, Min, Sum

    mk = {"sum": Sum, "min": Min, "max": Max}
    aggs = []
    for col, how in state.items():
        if how not in mk:
            raise ValueError(f"unknown merge '{how}' for state column '{col}'")
        aggs.append(mk[how](col, alias_name=col))
    combined = (
        ds.map_batches(map_script, batch_format="pyarrow")
        .groupby(key)
        .aggregate(*aggs)
    )
    return combined.map_batches(reduce_script, batch_format="pandas")


def cumulative_cardinality(events_ds, key: str = "user_id", ts_col: str = "ts",
                           bucket_s: int = 86400) -> pd.DataFrame:
    """ES ``cumulative_cardinality`` pipeline agg, EXACT: per date bucket
    the running count of distinct keys ever seen. Shape: per-batch
    (key, min bucket) partials → one narrow shuffle over distinct keys
    (groupby Min — the unavoidable exact-distinct exchange, carrying two
    ints per key) → bucket-sized first-seen counts → driver gap-fill +
    cumsum. ES computes this approximately from per-bucket HLL sketches;
    this is the deterministic exact form (`functions/sketches.py` HLL is
    the approximate alternative when keys don't fit a shuffle)."""
    from ray.data.aggregate import Max, Min, Sum

    div = np.int64(bucket_s) * 1_000_000

    def first_partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({key: b[key],
                      "b": pa.array(us // div, pa.int64()),
                      "b2": pa.array(us // div, pa.int64())})
        g = t.group_by(key).aggregate([("b", "min"), ("b2", "max")])
        return g.rename_columns([key, "b", "b2"])

    first_seen = (
        events_ds.map_batches(first_partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Min("b", alias_name="first_b"), Max("b2", alias_name="last_b"))
    ).materialize()  # consumed twice below (counts + bounds); key-sized, not corpus-sized

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.select(["first_b"]).group_by("first_b").aggregate([([], "count_all")])
        return g.rename_columns(["bucket", "c_p"])

    nb = (
        first_seen.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_p", alias_name="new_keys"))
        .to_pandas()
    )
    if nb.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "new_keys": pd.Series([], dtype=np.int64),
                             "cum_keys": pd.Series([], dtype=np.int64)})

    # the series spans the parent date_histogram's FULL bucket range
    # (ES emits every histogram bucket, flat cum across no-new-key days);
    # bounds ride the first-seen shuffle: min(first_b) IS the earliest
    # event bucket and max(last_b) the latest — no second corpus scan
    lo = int(nb["bucket"].min())
    hi = int(first_seen.max("last_b"))
    nb = nb.sort_values("bucket", kind="mergesort")
    b = nb["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(lo, hi + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    n[b - lo] = nb["new_keys"].to_numpy(dtype=np.int64)
    return pd.DataFrame({"bucket": full, "new_keys": n,
                         "cum_keys": np.cumsum(n).astype(np.int64)})


def moving_percentiles(events_ds, ts_col: str = "ts", bucket_s: int = 86400,
                       value_col: str = "value", window: int = 3,
                       qs: tuple[float, ...] = (0.5, 0.9)) -> pd.DataFrame:
    """ES ``moving_percentiles`` pipeline agg, EXACT (inclusive-window
    variant): for every bucket that has events, the percentile_cont
    quantiles of all values in the trailing ``window`` buckets
    ``[b−window+1, b]``. ES merges per-bucket TDigests; this is the
    deterministic exact form over per-bucket VALUE HISTOGRAMS:

    1. one streaming pass → distinct (bucket, value) counts (the same
       histogram shuffle the quantile operators use);
    2. each histogram row fans out to the ≤``window`` buckets it
       contributes to (shuffle volume = window × histogram — still
       value-cardinality, never raw rows);
    3. a per-bucket finisher merges counts and interpolates with the
       exact-rational bracketing rule shared with the SQL twin.

    Escalation: for value cardinalities that outgrow a reducer, swap the
    exact histogram for a mergeable TDigest/KLL sketch."""
    from fractions import Fraction

    import ray

    from hybrid_sanctions_search_engine_ray.stages.quantiles import hist_counts, interp_from_hist

    if window < 1:
        raise ValueError("window must be >= 1")
    div = np.int64(bucket_s) * 1_000_000
    q_fracs = [(float(q), Fraction(str(q))) for q in qs]

    def addb(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array(us // div, pa.int64()), value_col: b[value_col]})

    withb = events_ds.map_batches(addb, batch_format="pyarrow")
    hist = hist_counts(withb, "bucket", value_col).materialize()
    existing = hist.groupby("bucket").count().to_pandas()
    if existing.empty:
        cols = {"bucket": pd.Series([], dtype=np.int64)}
        cols.update({f"p{int(q * 100)}": pd.Series([], dtype=np.float64) for q, _ in q_fracs})
        return pd.DataFrame(cols)
    present = np.sort(existing["bucket"].to_numpy(dtype=np.int64))
    present_ref = ray.put(present)

    def expand(b: pa.Table) -> pa.Table:
        keep = ray.get(present_ref)
        bk = b["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[value_col].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        outs = []
        for k in range(window):
            ob = bk + k
            pos = np.searchsorted(keep, ob)
            safe = np.minimum(pos, keep.size - 1)
            ok = (pos < keep.size) & (keep[safe] == ob)
            outs.append(pa.table({"out_bucket": pa.array(ob[ok]),
                                  "v": pa.array(v[ok]),
                                  "c": pa.array(c[ok])}))
        return pa.concat_tables(outs)

    exp = hist.map_batches(expand, batch_format="pyarrow")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("v", as_index=False)["c"].sum().sort_values("v", kind="mergesort")
        cum = g["c"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        vals = g["v"].to_numpy(dtype=np.float64)
        row = {"bucket": None}
        for qf, frac in q_fracs:
            row[f"p{int(qf * 100)}"] = interp_from_hist(vals, cum, n, frac)
        return pd.DataFrame([row])

    def finish_with_key(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["out_bucket"].iloc[0])
        out = finish(g[["v", "c"]].copy())
        out["bucket"] = np.int64(b)
        return out

    res = exp.groupby("out_bucket").map_groups(finish_with_key, batch_format="pandas").to_pandas()
    res = res.sort_values("bucket", kind="mergesort").reset_index(drop=True)
    res["bucket"] = res["bucket"].astype(np.int64)
    return res[["bucket", *(f"p{int(q * 100)}" for q, _ in q_fracs)]]


def histogram(ds, col: str, interval: float, offset: float = 0.0,
              min_doc_count: int = 0) -> pd.DataFrame:
    """ES numeric ``histogram`` aggregation, exact: bucket index
    ``k = floor((x - offset) / interval)`` (the IEEE-double expression is
    shared verbatim with the SQL twin), bucket key ``offset + k*interval``.
    With ``min_doc_count == 0`` the series is gap-filled between the min
    and max observed bucket (ES's default empty-bucket emission); higher
    values filter the bucket list. Per-batch (count, sum) partials →
    ONE bucket-keyed shuffle → a series-sized finisher; raw rows never
    move (reference ES-tier agg assembly: elasticsearch_adapters.py)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        x = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        k = np.floor((x - offset) / interval).astype(np.int64)
        t = pa.table({"k": pa.array(k), "v": pa.array(x)})
        g = t.group_by("k").aggregate([("v", "sum"), ([], "count_all")])
        return g.rename_columns(["k", "s_p", "c_p"])

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("c_p", alias_name="doc_count"), Sum("s_p", alias_name="v_sum"))
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"bucket_key": pd.Series([], dtype=np.float64),
                             "doc_count": pd.Series([], dtype=np.int64),
                             "v_sum": pd.Series([], dtype=np.float64),
                             "v_avg": pd.Series([], dtype=np.float64)})
    df = df.sort_values("k", kind="mergesort")
    k = df["k"].to_numpy(dtype=np.int64)
    if min_doc_count == 0:
        full = np.arange(k[0], k[-1] + 1, dtype=np.int64)
        cnt = np.zeros(full.size, dtype=np.int64)
        s = np.zeros(full.size, dtype=np.float64)
        cnt[k - k[0]] = df["doc_count"].to_numpy(dtype=np.int64)
        s[k - k[0]] = df["v_sum"].to_numpy(dtype=np.float64)
    else:
        m = df["doc_count"].to_numpy(dtype=np.int64) >= min_doc_count
        full, cnt, s = k[m], df["doc_count"].to_numpy(dtype=np.int64)[m], df["v_sum"].to_numpy(dtype=np.float64)[m]
    avg = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
    return pd.DataFrame({
        "bucket_key": offset + full * float(interval),
        "doc_count": cnt,
        "v_sum": np.round(s, 4),
        "v_avg": np.round(avg, 4),
    })


def top_metrics(ds, key: str, sort_col: str, tiebreak_col: str,
                metric_cols: list[str]) -> pd.DataFrame:
    """ES ``top_metrics`` aggregation: per bucket the metric values of
    the row with the LARGEST sort value (ES leaves sort ties unspecified;
    we make them deterministic with ``tiebreak_col`` desc — documented
    and shared with the SQL twin's ``row_number`` order). Per-batch
    argmax partial (one lexsort, ≤ #keys rows survive per batch) → the
    tiny per-batch winners reduce on the driver with the same rule."""
    cols = [key, sort_col, tiebreak_col, *metric_cols]

    def partial(b: pa.Table) -> pa.Table:
        b = b.select(cols)
        kv = b[key].to_numpy(zero_copy_only=False)
        sv = b[sort_col].to_numpy(zero_copy_only=False)
        tv = b[tiebreak_col].to_numpy(zero_copy_only=False)
        # last row per key in (key asc, sort asc, tiebreak asc) order = winner
        order = np.lexsort((tv, sv, kv))
        kk = kv[order]
        last = np.nonzero(np.append(kk[1:] != kk[:-1], True))[0]
        return b.take(pa.array(order[last]))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
    parts = parts.sort_values([key, sort_col, tiebreak_col], kind="mergesort")
    out = parts.drop_duplicates(subset=[key], keep="last")
    return out[cols].reset_index(drop=True)


def sibling_bucket_stats(events_ds, ts_col: str = "ts", bucket_s: int = 86400) -> pd.DataFrame:
    """The ES sibling pipeline aggs (``stats_bucket`` ≡ min_bucket +
    max_bucket + avg_bucket + sum_bucket in one pass) over a day
    histogram, ``gap_policy: skip`` semantics (empty buckets do not
    participate — ES's default for sibling aggs). Returns ONE row:
    bucket count / sum / min / max / avg of the per-day doc counts plus
    the FIRST bucket id achieving each extreme (deterministic tie rule,
    shared with the SQL twin). Integer partials; driver work is O(#days)."""
    from ray.data.aggregate import Sum

    div = np.int64(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({"bucket": pa.array(us // div, pa.int64())}).group_by("bucket").aggregate(
            [([], "count_all")])
        return g.rename_columns(["bucket", "c_p"])

    df = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_p", alias_name="n"))
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame([{"n_buckets": 0, "sum_count": 0, "min_count": 0,
                              "max_count": 0, "avg_count": 0.0,
                              "min_bucket": -1, "max_bucket": -1}])
    df = df.sort_values("bucket", kind="mergesort")
    n = df["n"].to_numpy(dtype=np.int64)
    b = df["bucket"].to_numpy(dtype=np.int64)
    return pd.DataFrame([{
        "n_buckets": np.int64(n.size),
        "sum_count": np.int64(n.sum()),
        "min_count": np.int64(n.min()),
        "max_count": np.int64(n.max()),
        "avg_count": round(float(n.sum()) / n.size, 6),
        "min_bucket": np.int64(b[n == n.min()][0]),
        "max_bucket": np.int64(b[n == n.max()][0]),
    }])


def normalize_series(events_ds, ts_col: str = "ts", bucket_s: int = 86400) -> pd.DataFrame:
    """ES ``normalize`` pipeline agg (method ``rescale_0_1``) over the
    gap-filled day histogram: ``norm = (n − min) / (max − min)`` with a
    flat series (max == min) mapping to 0.0 — the rule is shared
    verbatim with the SQL twin (all inputs are exact integers, so the
    one float division is IEEE-identical on both sides). Same integer
    partial/shuffle shape as ``bucket_series``."""
    from ray.data.aggregate import Sum

    div = np.int64(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({"bucket": pa.array(us // div, pa.int64())}).group_by("bucket").aggregate(
            [([], "count_all")])
        return g.rename_columns(["bucket", "c_p"])

    df = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_p", alias_name="n_events"))
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "norm": pd.Series([], dtype=np.float64)})
    df = df.sort_values("bucket", kind="mergesort")
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b[0], b[-1] + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    n[b - b[0]] = df["n_events"].to_numpy(dtype=np.int64)
    mn, mx = int(n.min()), int(n.max())
    norm = np.zeros(full.size, dtype=np.float64) if mx == mn else (n - mn) / float(mx - mn)
    return pd.DataFrame({"bucket": full, "n_events": n, "norm": np.round(norm, 6)})


def _day_counts(events_ds, ts_col: str, bucket_s: int) -> pd.DataFrame:
    """Shared integer day-histogram shuffle: (bucket, n) sorted by bucket."""
    from ray.data.aggregate import Sum

    div = np.int64(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({"bucket": pa.array(us // div, pa.int64())}).group_by("bucket").aggregate(
            [([], "count_all")])
        return g.rename_columns(["bucket", "c_p"])

    df = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_p", alias_name="n"))
        .to_pandas()
    )
    return df.sort_values("bucket", kind="mergesort").reset_index(drop=True)


def percentiles_bucket(events_ds, ts_col: str = "ts", bucket_s: int = 86400,
                       qs: tuple = (0.25, 0.5, 0.75, 0.95)) -> pd.DataFrame:
    """ES ``percentiles_bucket`` sibling pipeline agg: percentile_cont of
    the per-day doc counts over the GAP-FILLED day histogram (empty days
    participate as 0 — date_histogram's min_doc_count=0 default). The
    interpolation is the exact-rational bracketing rule shared with the
    other quantile operators (:func:`interp_from_hist`), so values match
    DuckDB ``quantile_cont`` bit-for-bit on the integer series. One
    integer bucket shuffle; driver work is O(#days)."""
    df = _day_counts(events_ds, ts_col, bucket_s)
    if df.empty:
        return pd.DataFrame({f"p{int(q * 100)}": pd.Series([], dtype=np.float64) for q in qs})
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b[0], b[-1] + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    n[b - b[0]] = df["n"].to_numpy(dtype=np.int64)
    vals = np.sort(n)
    cum = np.arange(1, vals.size + 1, dtype=np.int64)
    row = {}
    for q in qs:
        row[f"p{int(q * 100)}"] = interp_from_hist(vals, cum, vals.size, Fraction(str(q)))
    return pd.DataFrame([row])


def matrix_stats(ds, cols: list[str]) -> pd.DataFrame:
    """ES ``matrix_stats`` agg over integer-valued columns: per ordered
    pair (x, y) the count, means, sample variances, covariance and
    Pearson correlation — all derived from EXACT int64 sufficient
    statistics (n, Σx, Σy, Σx², Σy², Σxy) accumulated in one streaming
    pass, with ONE shared float expression per derived value (verbatim
    in the SQL twin):
      mean = s/n ;  var = (sq − s·s/n)/(n−1) ;
      cov = (sxy − sx·sy/n)/(n−1) ;  corr = cov/sqrt(var_x·var_y).
    Columns must be integer-valued (caller pre-rounds floats); raises on
    non-integral input rather than silently losing exactness."""
    names = list(cols)

    def partial(b: pa.Table) -> pa.Table:
        arrs = []
        for c in names:
            x = b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            xi = x.astype(np.int64)
            if not np.array_equal(xi.astype(np.float64), x):
                raise ValueError(f"matrix_stats: column {c!r} is not integer-valued")
            arrs.append(xi)
        row: dict = {"n": [np.int64(len(b))]}
        for c, x in zip(names, arrs):
            row[f"s_{c}"] = [np.int64(x.sum())]
            row[f"q_{c}"] = [np.int64((x * x).sum())]
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                row[f"p_{names[i]}_{names[j]}"] = [np.int64((arrs[i] * arrs[j]).sum())]
        return pa.table(row)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or parts["n"].sum() < 2:
        raise ValueError("matrix_stats needs >= 2 rows")
    tot = parts.sum()
    n = float(tot["n"])
    out = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            cx, cy = names[i], names[j]
            sx, sy = float(tot[f"s_{cx}"]), float(tot[f"s_{cy}"])
            var_x = (float(tot[f"q_{cx}"]) - sx * sx / n) / (n - 1.0)
            var_y = (float(tot[f"q_{cy}"]) - sy * sy / n) / (n - 1.0)
            cov = (float(tot[f"p_{cx}_{cy}"]) - sx * sy / n) / (n - 1.0)
            out.append({
                "field_x": cx, "field_y": cy, "n_rows": np.int64(tot["n"]),
                "mean_x": round(sx / n, 6), "mean_y": round(sy / n, 6),
                "var_x": round(var_x, 6), "var_y": round(var_y, 6),
                "cov": round(cov, 6),
                # a constant column has no defined correlation — NaN,
                # not ZeroDivisionError (code-review r05 finding)
                "corr": (round(cov / math.sqrt(var_x * var_y), 6)
                         if var_x > 0.0 and var_y > 0.0 else float("nan")),
            })
    return pd.DataFrame(out)


def _day_key_counts(events_ds, key_col: str, keys: tuple, ts_col: str,
                    bucket_s: int) -> pd.DataFrame:
    """Shared (bucket, key) integer day-histogram shuffle restricted to
    ``keys``: returns (bucket, k, n)."""
    from ray.data.aggregate import Sum

    div = np.int64(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        k = b[key_col]
        mask = pc.is_in(k, value_set=pa.array(list(keys)))
        t = b.filter(mask)
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({
            "bucket": pa.array(us // div, pa.int64()),
            "k": t[key_col],
        }).group_by(["bucket", "k"]).aggregate([([], "count_all")])
        return g.rename_columns(["bucket", "k", "c_p"])

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["bucket", "k"])
        .aggregate(Sum("c_p", alias_name="n"))
        .to_pandas()
    )


def _gap_filled_pair(df: pd.DataFrame, key_a: str, key_b: str):
    """Gap-fill two per-day count series over the union day range:
    (full bucket grid, counts_a, counts_b) as int64 arrays."""
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b.min(), b.max() + 1, dtype=np.int64)
    a_cnt = np.zeros(full.size, dtype=np.int64)
    b_cnt = np.zeros(full.size, dtype=np.int64)
    for key, dest in ((key_a, a_cnt), (key_b, b_cnt)):
        sub = df[df["k"] == key]
        dest[sub["bucket"].to_numpy(dtype=np.int64) - full[0]] = sub["n"].to_numpy(dtype=np.int64)
    return full, a_cnt, b_cnt


def bucket_correlation(events_ds, key_col: str, key_a: str, key_b: str,
                       ts_col: str = "ts", bucket_s: int = 86400) -> pd.DataFrame:
    """ES ``bucket_correlation`` pipeline agg: Pearson correlation
    between the per-day count series of two key values (e.g. do 'click'
    and 'purchase' days co-move?). Both series are gap-filled integer
    counts over the union day range, so the sufficient statistics are
    exact int64 and the final expression (shared verbatim with SQL) is
    the only float math. One (bucket, key) shuffle; driver O(#days)."""
    df = _day_key_counts(events_ds, key_col, (key_a, key_b), ts_col, bucket_s)
    if df.empty:
        raise ValueError("bucket_correlation: no rows for either key")
    full, a_cnt, b_cnt = _gap_filled_pair(df, key_a, key_b)
    n = float(full.size)
    sa, sb = float(a_cnt.sum()), float(b_cnt.sum())
    saa = float((a_cnt * a_cnt).sum())
    sbb = float((b_cnt * b_cnt).sum())
    sab = float((a_cnt * b_cnt).sum())
    denom = math.sqrt((saa - sa * sa / n) * (sbb - sb * sb / n))
    if denom == 0.0:
        raise ValueError("bucket_correlation: a series is constant")
    return pd.DataFrame([{
        "key_a": key_a, "key_b": key_b, "n_buckets": np.int64(full.size),
        "corr": round((sab - sa * sb / n) / denom, 6),
    }])


def string_stats(ds, col: str) -> pd.DataFrame:
    """ES ``string_stats`` agg (with show_distribution's entropy): doc
    count, min/max/avg codepoint length and the Shannon entropy of the
    field's character distribution. Each batch emits an alphabet-sized
    codepoint→count table plus ONE sentinel row (cp = −1) carrying the
    scalar partials (doc count, Σlen, min len, max len) — the same
    sentinel-through-the-shuffle trick as the corpus stats build. One
    small shuffle keyed by codepoint; entropy derives from the EXACT
    merged integer counts as ``log2(N) − (Σ c·log2 c)/N`` (alphabet-sized
    sum — float error orders below the shared round-4 quantum). Lengths
    are vectorized Arrow ``utf8_length``; codepoints come from ONE
    utf-32 encode of the batch-joined text (no per-char Python loop)."""
    from ray.data.aggregate import Max, Min, Sum

    BIG = np.int64(2**62)

    def partial(b: pa.Table) -> pa.Table:
        s = pc.fill_null(b[col], "")  # null ≡ empty string (documented; SQL: coalesce)
        lens = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
        joined = "".join(s.to_pylist())
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
        uniq, cnt = np.unique(codes, return_counts=True)
        k = uniq.size
        return pa.table({
            "cp": pa.array(np.r_[uniq.astype(np.int64), [-1]]),
            "c": pa.array(np.r_[cnt.astype(np.int64), [0]]),
            "nd": pa.array(np.r_[np.zeros(k, np.int64), [len(b)]]),
            "sl": pa.array(np.r_[np.zeros(k, np.int64), [lens.sum() if lens.size else 0]]),
            "mn": pa.array(np.r_[np.full(k, BIG), [lens.min() if lens.size else BIG]]),
            "mx": pa.array(np.r_[np.full(k, np.int64(-1)), [lens.max() if lens.size else -1]]),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cp")
        .aggregate(Sum("c", alias_name="c"), Sum("nd", alias_name="nd"),
                   Sum("sl", alias_name="sl"), Min("mn", alias_name="mn"),
                   Max("mx", alias_name="mx"))
        .to_pandas()
    )
    sent = agg[agg["cp"] == -1]
    chars = agg[agg["cp"] != -1]
    n_docs = int(sent["nd"].iloc[0]) if len(sent) else 0
    if n_docs == 0 or len(chars) == 0:
        return pd.DataFrame([{"n_docs": np.int64(n_docs), "min_len": np.int64(0),
                              "max_len": np.int64(0), "avg_len": 0.0,
                              "n_distinct_chars": np.int64(0), "entropy": 0.0}])
    c = np.sort(chars["c"].to_numpy(dtype=np.int64))  # deterministic sum order
    total = float(c.sum())
    entropy = math.log2(total) - float((c * np.log2(c)).sum()) / total
    return pd.DataFrame([{
        "n_docs": np.int64(n_docs),
        "min_len": np.int64(sent["mn"].iloc[0]),
        "max_len": np.int64(sent["mx"].iloc[0]),
        "avg_len": round(float(sent["sl"].iloc[0]) / n_docs, 6),
        "n_distinct_chars": np.int64(len(chars)),
        "entropy": round(entropy, 4),
    }])


def cumulative_sum(events_ds, ts_col: str = "ts", bucket_s: int = 86400) -> pd.DataFrame:
    """ES ``cumulative_sum`` pipeline agg under a date_histogram: the
    running total of the per-day doc counts over the GAP-FILLED day grid
    (min_doc_count=0 — empty days carry the previous total forward).
    Pure integer math end-to-end: one bucket shuffle, an O(#days)
    driver cumsum."""
    df = _day_counts(events_ds, ts_col, bucket_s)
    if df.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "cum_n": pd.Series([], dtype=np.int64)})
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b[0], b[-1] + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    n[b - b[0]] = df["n"].to_numpy(dtype=np.int64)
    return pd.DataFrame({"bucket": full, "n_events": n, "cum_n": np.cumsum(n)})


def rate_agg(events_ds, ts_col: str = "ts", value_col: str = "value",
             bucket_s: int = 86400, unit_s: int = 3600) -> pd.DataFrame:
    """ES ``rate`` agg under a date_histogram: per day bucket, the doc
    rate and the value-sum rate normalized to ``unit_s`` (day→hour by
    default: rate = bucket_total / (bucket_s/unit_s)). Values are summed
    as EXACT integer cents (round-half-away ``floor(|v|·100+0.5)·sign``,
    the repo-wide money convention) so the only float math is the two
    final divisions, shared verbatim with the SQL twin. Gap-filled days
    rate 0. One bucket shuffle carrying (count, cents) partials."""
    from ray.data.aggregate import Sum

    div = np.int64(bucket_s) * 1_000_000
    factor = float(bucket_s) / float(unit_s)

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64)
        g = pa.table({
            "bucket": pa.array(us // div, pa.int64()),
            "cents": pa.array(cents),
        }).group_by("bucket").aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["bucket", "cents_p", "c_p"])

    df = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_p", alias_name="n"), Sum("cents_p", alias_name="cents"))
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "doc_rate": pd.Series([], dtype=np.float64),
                             "value_rate": pd.Series([], dtype=np.float64)})
    df = df.sort_values("bucket", kind="mergesort").reset_index(drop=True)
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b[0], b[-1] + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    cents = np.zeros(full.size, dtype=np.int64)
    n[b - b[0]] = df["n"].to_numpy(dtype=np.int64)
    cents[b - b[0]] = df["cents"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "bucket": full,
        "doc_rate": np.round(n / factor, 6),
        "value_rate": np.round(cents / 100.0 / factor, 6),
    })


def categorize_text(ds, col: str, n_tokens: int = 4, top_n: int = 15) -> pd.DataFrame:
    """ES ``categorize_text`` agg, deterministic twin: group documents by
    a token-pattern template — lowercase, digit-runs collapsed to
    ``<num>``, whitespace-trimmed, first ``n_tokens`` whitespace tokens
    joined by one space — then the top-N templates by (count desc,
    template asc). The normalization is ALL vectorized Arrow RE2
    (``utf8_lower`` → ``replace_substring_regex`` → trim →
    ``split_pattern_regex`` → ``list_slice`` → ``binary_join``), the
    same RE2 semantics DuckDB's regexp functions use, so the SQL twin is
    character-identical. Per-batch template counts pre-aggregate before
    ONE template-keyed shuffle."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        s = pc.fill_null(b[col], "")
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, pattern="[0-9]+", replacement="<num>")
        s = pc.utf8_trim_whitespace(s)
        toks = pc.list_slice(pc.split_pattern_regex(s, pattern="\\s+"), 0, n_tokens)
        key = pc.binary_join(toks.cast(pa.list_(pa.string())), " ")
        g = pa.table({"category": key}).group_by("category").aggregate([([], "count_all")])
        return g.rename_columns(["category", "c_p"])

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("category")
        .aggregate(Sum("c_p", alias_name="n_docs"))
        .to_pandas()
    )
    df = df.sort_values(["n_docs", "category"], ascending=[False, True],
                        kind="mergesort").head(top_n).reset_index(drop=True)
    df["n_docs"] = df["n_docs"].astype(np.int64)
    return df


def change_point(events_ds, ts_col: str = "ts", bucket_s: int = 86400) -> pd.DataFrame:
    """ES ``change_point`` agg, deterministic twin: over the gap-filled
    per-day count series, the split k (1 ≤ k < m) maximizing the
    absolute difference of segment means |mean(n[:k]) − mean(n[k:])| —
    a two-segment step-change detector. The prefix sums are exact
    integers; the objective ``abs(sl/k − (S−sl)/(m−k))`` is ONE float
    expression evaluated identically on both sides, so the argmax (ties
    → smallest k) is IEEE-reproducible. Returns the first bucket of the
    right segment, both means and the gap. Raises on <2 buckets."""
    df = _day_counts(events_ds, ts_col, bucket_s)
    if df.empty or df["bucket"].iloc[-1] == df["bucket"].iloc[0]:
        raise ValueError("change_point needs >= 2 day buckets")
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b[0], b[-1] + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    n[b - b[0]] = df["n"].to_numpy(dtype=np.int64)
    m = full.size
    total = int(n.sum())
    sl = np.cumsum(n)[:-1].astype(np.float64)  # prefix sums at k = 1..m-1
    k = np.arange(1, m, dtype=np.float64)
    d = np.abs(sl / k - (total - sl) / (m - k))
    best = int(np.argmax(d))  # first max = smallest k tiebreak
    return pd.DataFrame([{
        "change_bucket": np.int64(full[best + 1]),
        "mean_before": round(float(sl[best]) / float(k[best]), 6),
        "mean_after": round((total - float(sl[best])) / float(m - k[best]), 6),
        "gap": round(float(d[best]), 6),
    }])


def ks_test(events_ds, key_col: str, key_a: str, key_b: str,
            ts_col: str = "ts", bucket_s: int = 86400) -> pd.DataFrame:
    """ES ``bucket_count_ks_test`` pipeline agg: the two-sample
    Kolmogorov–Smirnov statistic between the day-of-occurrence
    distributions of two key values — D = max over the union day grid of
    |ECDF_a − ECDF_b|, with the ECDFs built from exact integer
    cumulative counts so the per-bucket expression ``ca/Na − cb/Nb`` is
    ONE float formula shared with SQL and the argmax (ties → smallest
    bucket) is IEEE-reproducible. One (bucket, key) shuffle."""
    df = _day_key_counts(events_ds, key_col, (key_a, key_b), ts_col, bucket_s)
    if df.empty:
        raise ValueError("ks_test: no rows for either key")
    full, a_cnt, b_cnt = _gap_filled_pair(df, key_a, key_b)
    na, nb = float(a_cnt.sum()), float(b_cnt.sum())
    if na == 0.0 or nb == 0.0:
        raise ValueError("ks_test: one key has no rows")
    diff = np.abs(np.cumsum(a_cnt) / na - np.cumsum(b_cnt) / nb)
    best = int(np.argmax(diff))
    return pd.DataFrame([{
        "key_a": key_a, "key_b": key_b, "n_a": np.int64(a_cnt.sum()),
        "n_b": np.int64(b_cnt.sum()),
        "d_stat": round(float(diff[best]), 6),
        "at_bucket": np.int64(full[best]),
    }])


def global_agg(events_ds, value_col: str, key_col: str, key_val: str) -> pd.DataFrame:
    """ES ``global`` agg: metrics over ALL docs side-by-side with a
    filtered bucket's, in one row — the escape hatch from query scope
    (here: total event count/revenue next to one event_type's). ONE
    streaming pass, block-sized partials (count + exact integer cents,
    total and filtered), no shuffle at all; sums are integers so block
    merge order can't change the result. Averages are the only float
    math, shared verbatim with SQL."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64)
        m = pc.equal(b[key_col], key_val).to_numpy(zero_copy_only=False)
        return pa.table({
            "n": [np.int64(len(b))], "cents": [np.int64(cents.sum())],
            "n_f": [np.int64(m.sum())], "cents_f": [np.int64(cents[m].sum())],
        })

    parts = events_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    tot = parts.sum()
    n, n_f = int(tot["n"]), int(tot["n_f"])
    if n == 0 or n_f == 0:
        raise ValueError("global_agg: empty input or empty filter bucket")
    return pd.DataFrame([{
        "n_total": np.int64(n),
        "sum_value_total": round(float(tot["cents"]) / 100.0, 2),
        "avg_value_total": round(float(tot["cents"]) / 100.0 / n, 6),
        "filter_key": key_val,
        "n_filtered": np.int64(n_f),
        "sum_value_filtered": round(float(tot["cents_f"]) / 100.0, 2),
        "avg_value_filtered": round(float(tot["cents_f"]) / 100.0 / n_f, 6),
    }])


def extended_stats_bucket(events_ds, ts_col: str = "ts",
                          bucket_s: int = 86400, sigma: float = 2.0) -> pd.DataFrame:
    """ES ``extended_stats_bucket`` sibling pipeline agg over the
    gap-filled per-day doc counts: count/min/max/sum/mean, POPULATION
    variance (ES's definition: ``(Σx² − (Σx)²/n)/n``), std deviation and
    the ±sigma bounds. Sufficient statistics are exact int64; the
    variance expression is ONE float formula shared verbatim with SQL."""
    df = _day_counts(events_ds, ts_col, bucket_s)
    if df.empty:
        raise ValueError("extended_stats_bucket needs at least one bucket")
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b[0], b[-1] + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    n[b - b[0]] = df["n"].to_numpy(dtype=np.int64)
    m = full.size
    s = int(n.sum())
    q = int((n * n).sum())
    mean = s / m
    var = (q - s * s / m) / m
    std = math.sqrt(var)
    return pd.DataFrame([{
        "n_buckets": np.int64(m),
        "min_count": np.int64(n.min()),
        "max_count": np.int64(n.max()),
        "sum_count": np.int64(s),
        "mean": round(mean, 6),
        "variance": round(var, 6),
        "std_dev": round(std, 6),
        "upper_bound": round(mean + sigma * std, 6),
        "lower_bound": round(mean - sigma * std, 6),
    }])


def daily_cardinality(events_ds, key_col: str, ts_col: str = "ts",
                      bucket_s: int = 86400) -> pd.DataFrame:
    """ES ``date_histogram`` with a ``cardinality`` sub-aggregation,
    EXACT: distinct keys per day. Per batch the (bucket, key) pairs
    dedup locally, then ONE (bucket, key) shuffle dedups globally (count
    distinct without ever moving raw rows twice); the per-bucket count
    is a second vocabulary-sized pass. Empty days report 0."""
    from ray.data.aggregate import Count

    div = np.int64(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"bucket": pa.array(us // div, pa.int64()), "k": b[key_col]})
        return t.group_by(["bucket", "k"]).aggregate([]).select(["bucket", "k"])

    uniq = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["bucket", "k"])
        .aggregate(Count())
        .select_columns(["bucket"])
    )

    def per_bucket(b: pa.Table) -> pa.Table:
        g = b.group_by("bucket").aggregate([([], "count_all")])
        return g.rename_columns(["bucket", "c_p"])

    from ray.data.aggregate import Sum

    df = (
        uniq.map_batches(per_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_p", alias_name="n_distinct"))
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "n_distinct": pd.Series([], dtype=np.int64)})
    df = df.sort_values("bucket", kind="mergesort").reset_index(drop=True)
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b[0], b[-1] + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    n[b - b[0]] = df["n_distinct"].to_numpy(dtype=np.int64)
    return pd.DataFrame({"bucket": full, "n_distinct": n})


def date_histogram_terms(events_ds, key_col: str, ts_col: str = "ts",
                         bucket_s: int = 86400) -> pd.DataFrame:
    """ES ``date_histogram`` with a ``terms`` sub-aggregation: per-day
    doc counts per key value, long format (bucket, key, n) — one
    (bucket, key) count shuffle, no gap filling (ES sub-buckets exist
    only where docs do)."""
    from ray.data.aggregate import Sum

    div = np.int64(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"bucket": pa.array(us // div, pa.int64()), "k": b[key_col]})
        g = t.group_by(["bucket", "k"]).aggregate([([], "count_all")])
        return g.rename_columns(["bucket", "k", "c_p"])

    df = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["bucket", "k"])
        .aggregate(Sum("c_p", alias_name="n"))
        .to_pandas()
    )
    df = df.sort_values(["bucket", "k"], kind="mergesort").reset_index(drop=True)
    df["n"] = df["n"].astype(np.int64)
    df["bucket"] = df["bucket"].astype(np.int64)
    return df[["bucket", "k", "n"]]


def missing_agg(ds, group_key: str, col: str, missing_value: str = ""):
    """ES ``terms(group_key)`` with a ``missing`` sub-agg on ``col``:
    per bucket, how many docs lack the field (here the generator's
    empty-string marker, plus genuine nulls). One vectorized equality
    per batch, (key → missing, total) partials, a buckets-sized shuffle.
    Returns (group_key, doc_count, missing_count) sorted by key."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        miss = pc.cast(
            pc.equal(pc.fill_null(b[col], missing_value), missing_value), pa.int64()
        )
        t = pa.table({group_key: b[group_key], "m": miss})
        g = t.group_by([group_key]).aggregate([("m", "sum"), ([], "count_all")])
        return pa.table({
            group_key: g[group_key],
            "m_p": pc.cast(g["m_sum"], pa.int64()),
            "c_p": pc.cast(g["count_all"], pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_key)
        .aggregate(Sum("c_p", alias_name="doc_count"),
                   Sum("m_p", alias_name="missing_count"))
    )
    df = agg.to_pandas()
    if df.empty:
        return pd.DataFrame({group_key: pd.Series([], dtype=object),
                             "doc_count": pd.Series([], dtype=np.int64),
                             "missing_count": pd.Series([], dtype=np.int64)})
    df = df.sort_values(group_key, kind="mergesort").reset_index(drop=True)
    df["doc_count"] = df["doc_count"].astype(np.int64)
    df["missing_count"] = df["missing_count"].astype(np.int64)
    return df[[group_key, "doc_count", "missing_count"]]


def terms_shard_bounds(ds, col: str, id_col: str, n_shards: int = 8,
                       shard_size: int = 5, size: int = 5, salt: str = "-sh"):
    """ES ``terms`` aggregation WITH its distributed-error accounting:
    each of ``n_shards`` shards contributes only its local top
    ``shard_size`` terms, and the coordinator reports, per merged term,
    the summed returned count plus ``doc_count_error_upper_bound`` — the
    sum over shards that did NOT return the term of that shard's last
    (smallest) returned count, 0 for shards that returned their whole
    term list (the ES rule). This is the semantics that makes a terms
    agg feasible on a 256-node cluster without shipping every (shard,
    term) pair; the bound is what tells the user when ``shard_size``
    must grow.

    Sharding is a stable md5 bucket of ``id_col`` (DuckDB
    ``md5_number_upper`` parity) so the result is deterministic and
    SQL-checkable. Engine shape: per-batch (shard, term) count partials
    → ONE small shuffle keyed on (shard, term) — never the raw rows —
    → an O(n_shards × shard_size) coordinator merge.
    Returns (term, doc_count, err_bound) top ``size`` by
    (doc_count desc, term asc)."""
    import hashlib

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        buckets = np.empty(len(ids), dtype=np.uint64)
        for i, kv in enumerate(ids):
            d = hashlib.md5((str(kv) + salt).encode("utf-8")).digest()
            buckets[i] = int.from_bytes(d[:8], "little")
        shard = (buckets % np.uint64(n_shards)).astype(np.int64)
        t = pa.table({"shard": pa.array(shard), "term": b[col]})
        g = t.group_by(["shard", "term"]).aggregate([([], "count_all")])
        return pa.table({
            "shard": g["shard"], "term": g["term"],
            "c_p": pc.cast(g["count_all"], pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["shard", "term"])
        .aggregate(Sum("c_p", alias_name="c"))
    )
    df = agg.to_pandas()
    if df.empty:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "doc_count": pd.Series([], dtype=np.int64),
                             "err_bound": pd.Series([], dtype=np.int64)})

    # coordinator merge — O(shards × shard_size), pure pandas
    df = df.sort_values(["shard", "c", "term"], ascending=[True, False, True],
                        kind="mergesort")
    df["r"] = df.groupby("shard").cumcount() + 1
    kept = df[df["r"] <= shard_size]
    # a shard that returned fewer than shard_size terms was exhaustive:
    # a term it didn't return has true count 0 there → error 0 (ES rule)
    per_shard = kept.groupby("shard").agg(mn=("c", "min"), k=("c", "size"))
    per_shard["err"] = np.where(per_shard["k"] == shard_size, per_shard["mn"], 0)
    # vectorized shard × term merge: pivot to a (shard, term) count grid;
    # a missing cell contributes the shard's err to the term's bound
    grid = kept.pivot(index="shard", columns="term", values="c") \
               .reindex(per_shard.index)
    miss = grid.isna().to_numpy()
    counts = np.where(miss, 0, grid.to_numpy(dtype=np.float64)).sum(axis=0)
    errs = (miss * per_shard["err"].to_numpy(np.int64)[:, None]).sum(axis=0)
    out = pd.DataFrame({"term": grid.columns.to_numpy(),
                        "doc_count": counts.astype(np.int64),
                        "err_bound": errs.astype(np.int64)})
    out = out.sort_values(["doc_count", "term"], ascending=[False, True],
                          kind="mergesort").head(size).reset_index(drop=True)
    out["doc_count"] = out["doc_count"].astype(np.int64)
    out["err_bound"] = out["err_bound"].astype(np.int64)
    return out


def date_range_agg(ds, ts_col: str, edges: list[str], value_col: str):
    """ES ``date_range`` aggregation: half-open TIMESTAMP buckets
    ``(-inf, e0), [e0, e1), ..., [e_last, inf)`` with per-bucket count
    and value sum/avg. Edges are ISO dates; comparisons run on exact
    int64 epoch-microseconds (the repo's timestamp convention), so
    bucket membership is integer-exact — one vectorized ``np.digitize``
    partial per batch, a buckets-sized shuffle."""
    from ray.data.aggregate import Sum

    e_us = np.array([np.datetime64(e).astype("datetime64[us]").astype(np.int64)
                     for e in edges], dtype=np.int64)
    if not (np.diff(e_us) > 0).all():
        raise ValueError("date_range edges must be strictly increasing")

    def partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # ES skips missing values: NaT timestamps (int64 min) and NaN
        # values must not land in any bucket (code-review r05 finding)
        valid = (ts != np.iinfo(np.int64).min) & ~np.isnan(v)
        ts, v = ts[valid], v[valid]
        idx = np.digitize(ts, e_us)
        t = pa.table({"bucket": pa.array(idx.astype(np.int32)),
                      "n": pa.array(np.ones(ts.size, np.int64)),
                      "s": pa.array(v)})
        return t.group_by("bucket").aggregate([("n", "sum"), ("s", "sum")])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_sum", alias_name="doc_count"),
                   Sum("s_sum", alias_name="v_sum"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int32),
                             "range_from": pd.Series([], dtype=object),
                             "range_to": pd.Series([], dtype=object),
                             "doc_count": pd.Series([], dtype=np.int64),
                             "v_sum": pd.Series([], dtype=np.float64),
                             "v_avg": pd.Series([], dtype=np.float64)})
    agg = agg.sort_values("bucket", kind="mergesort").reset_index(drop=True)
    lo = ["", *edges]
    hi = [*edges, ""]
    agg["range_from"] = [lo[int(i)] for i in agg["bucket"]]
    agg["range_to"] = [hi[int(i)] for i in agg["bucket"]]
    agg["v_avg"] = agg["v_sum"].to_numpy() / agg["doc_count"].to_numpy()
    agg["doc_count"] = agg["doc_count"].astype(np.int64)
    agg["bucket"] = agg["bucket"].astype(np.int32)
    return agg[["bucket", "range_from", "range_to", "doc_count", "v_sum", "v_avg"]]


def random_sampler_agg(ds, id_col: str, value_col: str, mod: int = 10,
                       salt: str = "-rs") -> pd.DataFrame:
    """ES ``random_sampler`` aggregation (probability = 1/``mod``):
    child aggregates run over a cheap deterministic sample and totals
    scale back up by 1/p. Membership is the repo's stable md5 rule
    (``md5(id+salt) % mod == 0`` — DuckDB ``md5_number_upper`` parity),
    a pure row property: retried tasks and the SQL twin select exactly
    the same rows, unlike ES's per-shard RNG. One streaming pass;
    driver sees one row."""
    import hashlib

    from ray.data.aggregate import Sum

    if mod < 1:
        raise ValueError("mod must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        h = np.empty(len(ids), dtype=np.uint64)
        for i, kv in enumerate(ids):
            d = hashlib.md5((str(kv) + salt).encode("utf-8")).digest()
            h[i] = int.from_bytes(d[:8], "little")
        keep = (h % np.uint64(mod)) == 0
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        return pa.table({"n_p": pa.array([int(keep.sum())], pa.int64()),
                         "s_p": pa.array([float(v.sum())], pa.float64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n_p", alias_name="sampled_count"),
                   Sum("s_p", alias_name="v_sum"))
        .to_pandas()
    )
    n = int(agg["sampled_count"].iloc[0]) if len(agg) else 0
    s = float(agg["v_sum"].iloc[0]) if len(agg) else 0.0
    return pd.DataFrame({
        "probability": [1.0 / mod],
        "sampled_count": pd.Series([n], dtype=np.int64),
        "est_doc_count": pd.Series([n * mod], dtype=np.int64),
        "v_avg_sample": [s / n if n else 0.0],
    })


def terms_partition(ds, col: str, num_partitions: int, partition: int,
                    size: int = 10, salt: str = "-tp") -> pd.DataFrame:
    """ES ``terms`` agg with ``include: {partition, num_partitions}`` —
    the huge-cardinality paging primitive: each request enumerates only
    the terms hashing into one partition, so a client can walk an
    unbounded term set in bounded pages. Partition membership is the
    repo's stable md5 rule over the TERM (DuckDB parity), applied inside
    the per-batch partial — non-member terms never enter the shuffle, so
    the exchange is 1/P of the vocabulary regardless of corpus size."""
    import hashlib

    from ray.data.aggregate import Sum

    if not (0 <= partition < num_partitions):
        raise ValueError("partition must be in [0, num_partitions)")

    def partial(b: pa.Table) -> pa.Table:
        g = b.select([col]).group_by([col]).aggregate([([], "count_all")])
        terms = g[col].to_pylist()
        keep = np.array([
            int.from_bytes(hashlib.md5((str(t) + salt).encode("utf-8"))
                           .digest()[:8], "little") % num_partitions == partition
            for t in terms
        ], dtype=bool) if terms else np.zeros(0, dtype=bool)
        t = pa.table({"term": g[col], "c_p": pc.cast(g["count_all"], pa.int64())})
        return t.filter(pa.array(keep))

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c_p", alias_name="doc_count"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "doc_count": pd.Series([], dtype=np.int64)})
    agg = agg.sort_values(["doc_count", "term"], ascending=[False, True],
                          kind="mergesort").head(size).reset_index(drop=True)
    agg["doc_count"] = agg["doc_count"].astype(np.int64)
    return agg[["term", "doc_count"]]


def variable_width_histogram(ds, col: str, buckets: int) -> pd.DataFrame:
    """ES ``variable_width_histogram``: buckets whose widths adapt to the
    data distribution. ES's version is a heuristic online clusterer
    (order-dependent, explicitly approximate); this engine instantiates
    the deterministic equal-depth spec instead: boundaries at the exact
    cent-quantized value cuts ``cut_i = min{v : cumcount(v) >= ceil(i*N/K)}``
    and every tie of a cent stays in one bucket, so the result is
    reproducible and SQL-twinnable. Per bucket: doc_count, v_min, v_max
    and the exact-cents mean (round4).

    Scale shape: one streaming pass of per-batch (cent, count) partials
    → a distinct-cents-sized shuffle (the bounded-cardinality histogram
    assumption shared with stages/quantiles.py — cent-quantized domains
    are bounded by the value range, not the row count); cuts, assignment
    and the per-bucket stats all come off that histogram — raw rows
    never move and there is no second pass."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        cents = (np.floor(np.abs(v) * 100.0 + 0.5) * np.sign(v)).astype(np.int64)
        u, c = np.unique(cents, return_counts=True)
        return pa.table({"cent": pa.array(u), "c_p": pa.array(c.astype(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("cent")
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
    )
    if hist.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "doc_count": pd.Series([], dtype=np.int64),
                             "v_min": pd.Series([], dtype=float),
                             "v_max": pd.Series([], dtype=float),
                             "v_avg": pd.Series([], dtype=float)})
    hist = hist.sort_values("cent", kind="mergesort").reset_index(drop=True)
    cents = hist["cent"].to_numpy(dtype=np.int64)
    counts = hist["c"].to_numpy(dtype=np.int64)
    cum = counts.cumsum()
    n = int(cum[-1])
    # exact integer ceil thresholds; duplicate cuts collapse (skew)
    cut_pos = np.searchsorted(cum, [-(-i * n // buckets) for i in range(1, buckets)],
                              side="left")
    cuts = np.unique(cents[cut_pos])
    bucket = np.searchsorted(cuts, cents, side="left")  # count of cuts < cent
    df = pd.DataFrame({"bucket": bucket, "cent": cents, "c": counts,
                       "prod": cents * counts})
    g = df.groupby("bucket", sort=True).agg(
        doc_count=("c", "sum"),
        min_cent=("cent", "min"),
        max_cent=("cent", "max"),
        sum_cent=("prod", "sum"),
    ).reset_index()
    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away
    return pd.DataFrame({
        "bucket": g["bucket"].astype(np.int64),
        "doc_count": g["doc_count"].astype(np.int64),
        "v_min": g["min_cent"].to_numpy(dtype=np.int64) / 100.0,
        "v_max": g["max_cent"].to_numpy(dtype=np.int64) / 100.0,
        "v_avg": round_half_away(
            g["sum_cent"].to_numpy(dtype=np.float64)
            / g["doc_count"].to_numpy(dtype=np.float64) / 100.0, 4),
    })


def benford_audit(ds, value_col: str = "value"):
    """Benford first-digit audit (the fraud/anomaly screen for monetary
    columns): distribution of the leading digit of the INTEGER cents
    value (no float log10 — digit via decimal string of round(v·100),
    exact on both engines) vs the Benford expectation
    ``log10(1 + 1/d)``, with the chi-square statistic. One 9-bucket
    exchange of per-batch digit partials."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from hybrid_sanctions_search_engine_ray.stages.textops import exact_cents
        v = exact_cents(b[value_col]).to_numpy(zero_copy_only=False)
        v = v[v > 0]
        if v.size == 0:
            return pa.table({"digit": pa.array([], pa.int64()),
                             "c_p": pa.array([], pa.int64())})
        first = pd.Series(v).astype(str).str[0].astype(np.int64).to_numpy()
        cnt = np.bincount(first, minlength=10)[1:10]
        nz = np.flatnonzero(cnt)
        return pa.table({"digit": pa.array(nz + 1, pa.int64()),
                         "c_p": pa.array(cnt[nz], pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("digit").aggregate(Sum("c_p", alias_name="c")).to_pandas())
    full = pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64)})
    agg = full.merge(agg, on="digit", how="left").fillna({"c": 0})
    c = agg["c"].to_numpy(np.int64)
    n = int(c.sum())
    exp_p = np.log10(1.0 + 1.0 / np.arange(1, 10))
    exp_c = n * exp_p
    chi2_terms = (c - exp_c) ** 2 / exp_c
    r4 = lambda x: np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4  # noqa: E731
    return pd.DataFrame({
        "digit": agg["digit"].astype(np.int64),
        "n": c,
        "observed_p": r4(np.where(n > 0, c / max(n, 1), 0.0)),
        "benford_p": r4(exp_p),
        "chi2_term": r4(chi2_terms),
    })
