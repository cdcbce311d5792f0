"""Streaming-shaped operators over ordered event logs: tumbling windows
and gap-based sessionization.

Ray Data has no event-time windows (SURVEY.md §2.9 — neither does the
reference); the batch re-expression treats the log as a partitioned,
ts-sortable table: tumbling windows are a pure key derivation
(``floor(epoch/size)``) followed by the partial-agg + small-groupby
pattern; sessions are ``groupby(key).map_groups`` over ts-sorted groups
with a vectorized gap cut (no per-row Python).

Ordering assumption: session correctness requires all events of one
``user_id`` in one group — guaranteed by the groupby shuffle; within the
group we sort by ts explicitly, so input order is free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_key(ts_us: np.ndarray, window_s: int) -> np.ndarray:
    """Epoch-second window start per event (matches DuckDB
    ``floor(epoch(ts)/w)*w`` for non-negative timestamps)."""
    return (ts_us // (window_s * 1_000_000)) * window_s


def hopping_window_keys(ts_us: np.ndarray, window_s: int, hop_s: int) -> tuple[np.ndarray, np.ndarray]:
    """Hopping (sliding) windows: size ``window_s``, advancing every
    ``hop_s`` (must divide the size). Each event falls in exactly
    ``window_s/hop_s`` windows; returns (row_index, window_start_s)
    flat pairs — the vectorized per-window emit (np.repeat + grid
    offsets, no Python loop) that feeds the same partial-agg + small
    groupby pattern as tumbling windows. The fan-out factor k is a
    constant, so the emitted stream is k× the input — still streaming,
    never materialized."""
    if window_s % hop_s != 0:
        raise ValueError("hop_s must divide window_s")
    k = window_s // hop_s
    base = (ts_us // (hop_s * 1_000_000)) * hop_s  # last grid start <= t
    starts = base[:, None] - (np.arange(k, dtype=np.int64) * hop_s)[None, :]
    rows = np.repeat(np.arange(ts_us.size, dtype=np.int64), k)
    return rows, starts.reshape(-1)


def sessionize_group(g: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    """One user's events → one row per session: a new session starts
    whenever the gap since the previous event exceeds ``gap_s``.
    Vectorized: diff + cumsum over the ts-sorted group."""
    g = g.sort_values("ts", kind="mergesort")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    gap_us = gap_s * 1_000_000
    new_session = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
    sid = np.cumsum(new_session) - 1
    out = (
        pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "session_idx": sid,
                "ts_us": ts,
                "value": g["value"].to_numpy(),
            }
        )
        .groupby("session_idx", sort=True)
        .agg(
            user_id=("user_id", "first"),
            session_start_us=("ts_us", "min"),
            session_end_us=("ts_us", "max"),
            n_events=("ts_us", "size"),
            sum_value=("value", "sum"),
        )
        .reset_index()
    )
    out["session_idx"] = out["session_idx"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out[["user_id", "session_idx", "session_start_us", "session_end_us", "n_events", "sum_value"]]


def sessionize(events_ds, gap_s: int = 1800, concurrency: int | None = None):
    """Dataset(user_id, ts, value) → one row per (user, session).
    ``concurrency`` bounds the map_groups task pool (it was accepted and
    silently ignored before — code-review r05 finding)."""
    kw = {"concurrency": concurrency} if concurrency else {}
    return events_ds.groupby("user_id").map_groups(
        lambda g: sessionize_group(g, gap_s), batch_format="pandas", **kw
    )


def gap_stats_group(g: pd.DataFrame, key: str, ts: str, order_break: str) -> pd.DataFrame:
    """One key's events → a single row of consecutive-gap statistics
    (``lag()``-window re-expression: sort by (ts, order_break), diff).
    Emits nothing for single-event keys (no gaps — matches SQL where the
    lag of the first row is NULL and aggregates ignore NULLs)."""
    g = g.sort_values([ts, order_break], kind="mergesort")
    t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
    if t.size < 2:
        return pd.DataFrame({key: pd.Series([], dtype=g[key].dtype),
                             "n_gaps": pd.Series([], dtype=np.int64),
                             "sum_gap_us": pd.Series([], dtype=np.int64),
                             "max_gap_us": pd.Series([], dtype=np.int64)})
    gaps = np.diff(t)
    # Integer microseconds (exact) — callers derive float seconds/means
    # themselves so rounding happens once, at the edge.
    return pd.DataFrame({key: [g[key].iloc[0]],
                         "n_gaps": np.array([gaps.size], dtype=np.int64),
                         "sum_gap_us": np.array([gaps.sum()], dtype=np.int64),
                         "max_gap_us": np.array([gaps.max()], dtype=np.int64)})


def gap_stats(events_ds, key: str = "user_id", ts: str = "ts", order_break: str = "event_id"):
    """Per-key stats over the gaps between consecutive events — the
    ``lag() OVER (PARTITION BY key ORDER BY ts)`` family as ONE key
    shuffle + vectorized per-group diff. ``order_break`` disambiguates
    equal timestamps so the ordering (hence the gap multiset) is
    deterministic."""
    return events_ds.groupby(key).map_groups(
        lambda g: gap_stats_group(g, key, ts, order_break), batch_format="pandas"
    )


def trailing_mean_group(g: pd.DataFrame, key: str, ts: str, order_break: str,
                        col: str, window_rows: int) -> pd.DataFrame:
    """One key's events → per-event trailing mean of ``col`` over the
    last ``window_rows`` rows (ROWS BETWEEN w-1 PRECEDING AND CURRENT
    ROW), vectorized via a prefix-sum difference."""
    g = g.sort_values([ts, order_break], kind="mergesort")
    v = g[col].to_numpy(dtype=np.float64)
    n = v.size
    # Window sums via explicit shifted adds, earliest addend first —
    # bit-identical to summing each window in row order (a prefix-sum
    # difference would introduce cancellation error on long groups).
    s = np.zeros(n, dtype=np.float64)
    # groups shorter than the window: offsets >= n contribute nothing
    # (v[:n-off] with a negative bound is a NON-empty slice that would
    # crash the broadcast — code-review r05 finding)
    for off in range(min(window_rows - 1, n - 1), -1, -1):
        s[off:] += v[: n - off]
    width = np.minimum(np.arange(1, n + 1), window_rows)
    mavg = s / width
    return pd.DataFrame({key: g[key].to_numpy(), order_break: g[order_break].to_numpy(),
                         "mavg": mavg})


def trailing_mean(events_ds, key: str = "user_id", ts: str = "ts",
                  order_break: str = "event_id", col: str = "value", window_rows: int = 3):
    """Per-row trailing moving average within each key — the
    ``avg() OVER (PARTITION BY ... ORDER BY ... ROWS k PRECEDING)``
    window as one key shuffle + per-group prefix sums. Output keeps
    (key, order_break) so rows stay joinable back to the source."""
    return events_ds.groupby(key).map_groups(
        lambda g: trailing_mean_group(g, key, ts, order_break, col, window_rows),
        batch_format="pandas",
    )


def bucket_series(events_ds, ts_col: str = "ts", bucket_s: int = 86400) -> pd.DataFrame:
    """Date-histogram + the ES *pipeline aggregations* over it:
    per-bucket event count, ``derivative`` (count − previous bucket's
    count, 0-seeded for the first bucket so the column stays non-null)
    and ``cumulative_sum``. One streaming pass: per-batch Arrow group_by
    partials on the integer bucket key (``epoch_us // bucket``), one
    small shuffle over the bucket keys, then the pipeline stages run
    vectorized on the driver-side bucket list (series-length-sized,
    never corpus-sized). All-integer, so exact."""
    from ray.data.aggregate import Sum

    div = np.int64(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({"bucket": pa.array(us // div, pa.int64())}).group_by("bucket").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["bucket", "c_p"])

    agg = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_p", alias_name="n_events"))
    )
    df = agg.to_pandas().sort_values("bucket", kind="mergesort").reset_index(drop=True)
    if df.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "deriv": pd.Series([], dtype=np.int64),
                             "cum": pd.Series([], dtype=np.int64)})
    # ES date_histogram emits EMPTY buckets too (min_doc_count 0) — the
    # pipeline aggs are only meaningful over the gap-filled series
    # (derivative across a gap is not a per-bucket delta otherwise)
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b[0], b[-1] + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    n[b - b[0]] = df["n_events"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "bucket": full,
            "n_events": n,
            "deriv": np.diff(n, prepend=0).astype(np.int64),
            "cum": np.cumsum(n).astype(np.int64),
        }
    )


_AUTO_LADDER_S = (3600, 86400, 604800, 2592000)  # hour, day, week, 30d


def auto_date_histogram(events_ds, ts_col: str = "ts", target_buckets: int = 10,
                        ladder_s: tuple[int, ...] = _AUTO_LADDER_S) -> pd.DataFrame:
    """ES ``auto_date_histogram``: pick the SMALLEST calendar interval
    from the ladder whose bucket count stays ≤ ``target_buckets``, then
    histogram on it. Two streaming passes: a min/max scan to choose the
    interval (a 1-row aggregate), then the ordinary integer-bucket count
    partials. Bucket count for interval d = floor(max/d) − floor(min/d)
    + 1 — all-integer, so the interval choice is exactly reproducible in
    SQL. Falls back to the coarsest ladder entry if none fits."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def mm(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64())
        return pa.table({"mn": pa.array([pc.min(us).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(us).as_py()], pa.int64())})

    bounds = events_ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    # empty Dataset loses columns on to_pandas; a dataset of only
    # zero-row blocks yields all-null min/max rows instead
    # (code-review r05 finding) — both mean "no events"
    if bounds.empty or bounds["mn"].isna().all():
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "interval_s": pd.Series([], dtype=np.int64),
                             "doc_count": pd.Series([], dtype=np.int64)})
    mn, mx = int(bounds["mn"].min()), int(bounds["mx"].max())
    div = np.int64(ladder_s[-1]) * 1_000_000
    for s in ladder_s:
        d = np.int64(s) * 1_000_000
        if mx // d - mn // d + 1 <= target_buckets:
            div = d
            break

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({"bucket": pa.array(us // div, pa.int64())}).group_by("bucket").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["bucket", "c_p"])

    df = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_p", alias_name="doc_count"))
        .to_pandas()
        .sort_values("bucket", kind="mergesort")
        .reset_index(drop=True)
    )
    df["interval_s"] = np.int64(div // 1_000_000)
    df["doc_count"] = df["doc_count"].astype(np.int64)
    return df[["bucket", "interval_s", "doc_count"]]


def series_window(events_ds, ts_col: str = "ts", bucket_s: int = 86400,
                  lag: int = 7, window: int = 3) -> pd.DataFrame:
    """ES ``serial_diff`` + ``moving_fn`` pipeline aggs over a gap-filled
    date histogram: per bucket, ``sdiff = n − n[t−lag]`` (0-seeded while
    t < lag, matching the derivative convention) and ``mov_mean`` = mean
    of the PREVIOUS ``window`` buckets (ES ``MovingFunctions.unweightedAvg``
    with shift 0 — the current bucket excluded; 0.0 for the first bucket,
    which has no history). Same single-scan integer partials as
    ``bucket_series``; the pipeline math is series-length-sized."""
    from ray.data.aggregate import Sum

    div = np.int64(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({"bucket": pa.array(us // div, pa.int64())}).group_by("bucket").aggregate(
            [([], "count_all")]
        )
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
                             "sdiff": pd.Series([], dtype=np.int64),
                             "mov_mean": pd.Series([], dtype=np.float64)})
    df = df.sort_values("bucket", kind="mergesort")
    b = df["bucket"].to_numpy(dtype=np.int64)
    full = np.arange(b[0], b[-1] + 1, dtype=np.int64)
    n = np.zeros(full.size, dtype=np.int64)
    n[b - b[0]] = df["n_events"].to_numpy(dtype=np.int64)
    lagged = np.zeros_like(n)
    if lag < n.size:
        lagged[lag:] = n[:-lag] if lag > 0 else n
    cum = np.concatenate([[0], np.cumsum(n)])
    lo = np.maximum(np.arange(full.size) - window, 0)
    prev_sum = cum[np.arange(full.size)] - cum[lo]
    prev_cnt = np.arange(full.size) - lo
    mov = np.where(prev_cnt > 0, prev_sum / np.maximum(prev_cnt, 1), 0.0)
    return pd.DataFrame(
        {
            "bucket": full,
            "n_events": n,
            "sdiff": (n - lagged).astype(np.int64),
            "mov_mean": mov.astype(np.float64),
        }
    )


def downsample(events_ds, out_dir: str, interval_us: int = 3_600_000_000,
               key_col: str = "event_type", ts_col: str = "ts",
               value_col: str = "value"):
    """ES TSDB-style downsampling: roll raw events up to one row per
    (time bucket, key) carrying count / exact-cents sum / min / max of
    the metric, WRITE the rollup as a partitioned parquet dataset (the
    new downsampled index), then return the read-back Dataset — the
    round-trip is part of the contract (a failed write can't pass).

    Scale shape: one streaming pass adds (bucket, cents); the only
    exchange is the bucket×key-sized groupby; the write is the standard
    atomic partitioned sink. bucket = epoch_us // interval (shared
    verbatim with the SQL twin)."""
    import shutil

    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    def add_bucket(b: pa.Table) -> pa.Table:
        ts_us = b[ts_col].cast(pa.int64())
        bucket = pc.divide(ts_us, interval_us)
        v = b[value_col].to_numpy(zero_copy_only=False)
        cents = (np.floor(np.abs(v) * 100.0 + 0.5).astype(np.int64)
                 * np.sign(v).astype(np.int64))
        return pa.table({
            "bucket": bucket.cast(pa.int64()),
            key_col: b[key_col],
            "cents": pa.array(cents, pa.int64()),
            value_col: b[value_col],
        })

    rolled = (
        events_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["bucket", key_col])
        .aggregate(
            Count(alias_name="n"),
            Sum("cents", alias_name="cents_sum"),
            Min(value_col, alias_name="value_min"),
            Max(value_col, alias_name="value_max"),
        )
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    rolled.write_parquet(out_dir)
    return rd.read_parquet(out_dir)


def watermark_lateness(events_ds, delay_s: int, window_s: int = 86400,
                       n_ranges: int = 256):
    """Streaming watermark / late-data accounting (the Beam/Flink
    allowed-lateness semantics): replay the event log in ARRIVAL order,
    advance the watermark to ``max(event time seen) − delay``, and per
    tumbling window count events that arrived on time vs late (an event
    is late iff its event time is below the watermark at its arrival).

    Arrival order is a deterministic Lehmer/MINSTD permutation of
    event_id — ``h = ((event_id % P) · 48271) % P`` with P = 2³¹−1,
    ties by event_id — pure BIGINT arithmetic computable identically in
    numpy and in the DuckDB twin (round 4: replaces the per-row Python
    md5 loop; the contract stands in for a network arrival sequence,
    since the raw log is time-ordered which would make lateness
    trivially zero).

    Scale shape — a distributed PREFIX MAX (the pack_bins prefix-sum
    pattern), round-4 un-pinned (no ``materialize()``): because arrival
    order IS hash order, ``h·n_ranges // P`` gives contiguous arrival
    ranges, so (1) a first streaming pass over the pruned read shuffles
    only range-count-sized partial maxima to the driver, which builds
    exclusive prefix-max carries; (2) a second streaming pass groups by
    range and runs ``np.maximum.accumulate`` within each range against
    its broadcast carry; (3) per-window partials → one windows-sized
    groupby. Raw events shuffle once, by range; nothing is pinned in
    the object store between passes.
    """
    import ray
    from ray.data.aggregate import Sum

    P = np.int64(2147483647)  # 2^31 - 1
    A = np.int64(48271)  # MINSTD multiplier; (id%P)*A < 2^47 — int64-safe
    delay_us = np.int64(delay_s) * 1_000_000
    win_us = np.int64(window_s) * 1_000_000

    def keyed(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (eid % P) * A % P
        tsu = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": pa.array(eid), "tsu": pa.array(tsu),
            "h": pa.array(h),
            "rng": pa.array(h * np.int64(n_ranges) // P),  # monotone in h
        })

    pairs = events_ds.map_batches(keyed, batch_format="pyarrow")

    def rng_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"rng": b["rng"], "tsu": b["tsu"]}).group_by("rng").aggregate(
            [("tsu", "max")])
        return g.rename_columns(["rng", "m_p"])

    from ray.data.aggregate import Max

    maxes = (
        pairs.map_batches(rng_partial, batch_format="pyarrow")
        .groupby("rng").aggregate(Max("m_p", alias_name="m")).to_pandas()
        .sort_values("rng", kind="mergesort")
    )
    rngs = maxes["rng"].to_numpy(np.int64)
    m = maxes["m"].to_numpy(np.int64)
    carry = np.r_[np.int64(np.iinfo(np.int64).min), np.maximum.accumulate(m)[:-1]]
    carry_ref = ray.put({"rngs": rngs, "carry": carry})

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(carry_ref)
        base = st["carry"][int(np.searchsorted(st["rngs"], int(g["rng"].iloc[0])))]
        order = np.lexsort((g["event_id"].to_numpy(np.int64),
                            g["h"].to_numpy(np.int64)))
        tsu = g["tsu"].to_numpy(np.int64)[order]
        wm = np.maximum(np.maximum.accumulate(tsu), base)
        late = tsu < wm - delay_us
        win = tsu // win_us
        t = pa.table({"window_id": pa.array(win), "late": pa.array(late.astype(np.int64))})
        gg = t.group_by(["window_id", "late"]).aggregate([([], "count_all")])
        return pd.DataFrame({"window_id": gg["window_id"].to_numpy(),
                             "late": gg["late"].to_numpy(),
                             "c_p": gg["count_all"].to_numpy().astype(np.int64)})

    agg = (
        pairs.groupby("rng").map_groups(flag, batch_format="pandas")
        .groupby(["window_id", "late"])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
    )
    piv = agg.pivot_table(index="window_id", columns="late", values="c",
                          fill_value=0, aggfunc="sum").reset_index()
    out = pd.DataFrame({
        "window_id": piv["window_id"].astype(np.int64),
        "n_ontime": piv[0].astype(np.int64) if 0 in piv.columns else np.int64(0),
        "n_late": piv[1].astype(np.int64) if 1 in piv.columns else np.int64(0),
    })
    return out.sort_values("window_id", kind="mergesort").reset_index(drop=True)


# --- temporal interval self-join --------------------------------------------


def interval_self_join_stats(events_ds, key: str = "user_id",
                             ts_col: str = "ts", max_gap_s: int = 3600):
    """Stream-stream interval self-join (the Flink/KSQL
    ``a.ts < b.ts <= a.ts + Δ`` join) reduced to per-key pair
    statistics: for every key, the number of ordered event pairs whose
    gap lies in (0, Δ] and the exact integer sum of those gaps (µs).

    Scale shape — the temporal 1-D analog of the geo_pairs grid: each
    event lands in time bucket ``ts//Δ`` and is replicated into the
    PREVIOUS bucket (2 rows per event, bounded fan-out); a pair's
    earlier event a finds every partner b in a's home bucket because
    ``tb ∈ (ta, ta+Δ]`` forces ``tb//Δ ∈ {g, g+1}``. The exchange is
    COARSE-bucketed (crc32(key)·31+g mod 256, the chatprep coarsening —
    millions of (key, bucket) cells would otherwise mean millions of
    per-group Python calls); inside each coarse group ALL (key, bucket)
    runs are processed at once with a composite-offset trick:
    ``comp = run_id·4Δ + (ts − bucket_start)`` keeps every run in a
    disjoint composite range (in-run offsets < 2Δ, probes add ≤ Δ), so
    TWO global ``searchsorted`` calls + one prefix-sum cover every run —
    no per-run loop. A second key-sized groupby folds partials. Ties
    (equal timestamps) pair in NEITHER direction — the documented
    strict-inequality contract, deterministic without an arrival-order
    tiebreak. All arithmetic int64 epoch-µs — exact."""
    from hybrid_sanctions_search_engine_ray.functions.hashing import hash_string_array

    gap_us = int(max_gap_s) * 1_000_000
    _NCB = 256

    def replicate(b: pa.Table) -> pa.Table:
        tsu = pc.cast(b[ts_col], pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        k = b[key].to_numpy(zero_copy_only=False)
        g = tsu // gap_us
        kh = hash_string_array(pa.array(k.astype(str), pa.string())).astype(np.int64)
        return pa.table({
            "cb": pa.array(np.concatenate([(kh * 31 + g) % _NCB,
                                           (kh * 31 + g - 1) % _NCB]), pa.int64()),
            "k": pa.array(np.concatenate([k, k])),
            "g": pa.array(np.concatenate([g, g - 1]), pa.int64()),
            "tsu": pa.array(np.concatenate([tsu, tsu]), pa.int64()),
            "home": pa.array(np.concatenate([np.ones(k.size, bool),
                                             np.zeros(k.size, bool)])),
        })

    def pairs(grp: pd.DataFrame) -> pd.DataFrame:
        tsu = grp["tsu"].to_numpy(np.int64)
        home = grp["home"].to_numpy(bool)
        g = grp["g"].to_numpy(np.int64)
        # np.unique keeps the key's ORIGINAL dtype (int keys stay int in
        # the output, full-string compare — no NUL hazard)
        kuniq, kcodes = np.unique(grp["k"].to_numpy(), return_inverse=True)
        # dense run ids over (key, bucket)
        gmin = int(g.min())
        rkey = kcodes.astype(np.int64) * (int(g.max()) - gmin + 1) + (g - gmin)
        _, r_id = np.unique(rkey, return_inverse=True)
        off = tsu - g * gap_us          # home ∈ [0, Δ), visitors ∈ [Δ, 2Δ)
        comp = r_id.astype(np.int64) * (4 * gap_us) + off
        order = np.argsort(comp, kind="stable")
        vcomp = comp[order]
        vts = tsu[order]
        pref = np.concatenate([[0], np.cumsum(vts, dtype=np.int64)])
        am = home
        acomp = comp[am]
        lo = np.searchsorted(vcomp, acomp, side="right")
        hi = np.searchsorted(vcomp, acomp + gap_us, side="right")
        n = (hi - lo).astype(np.int64)
        s = (pref[hi] - pref[lo]) - tsu[am] * n
        # fold to per-key partials inside the coarse group (np.add.at:
        # integer-exact, unlike float-accumulating bincount weights)
        n_k = np.zeros(len(kuniq), np.int64)
        s_k = np.zeros(len(kuniq), np.int64)
        np.add.at(n_k, kcodes[am], n)
        np.add.at(s_k, kcodes[am], s)
        return pd.DataFrame({"k": kuniq, "n_p": n_k, "s_p": s_k})

    partials = (
        events_ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    # final fold: (key × coarse-bucket)-bounded partials, key-sized
    # output — driver arithmetic, saving a whole second exchange; at
    # extreme key cardinality swap this for a groupby(k) Sum
    out = (partials.groupby("k", sort=True)
           .agg(n_pairs=("n_p", "sum"), sum_gap_us=("s_p", "sum"))
           .reset_index())
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    out["sum_gap_us"] = out["sum_gap_us"].astype(np.int64)
    return out
