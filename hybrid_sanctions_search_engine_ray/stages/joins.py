"""Join strategies (SURVEY.md §2.4).

* :func:`broadcast_join` — the small-side pattern (J2/J3): ``ray.put``
  the dimension table once, map the fact table's batches against it with
  a vectorized pandas merge. No shuffle; the small side ships to each
  actor/worker once via the object store, not per batch.
* For large-large joins the engine uses explicit bucketing
  (hash(key) % B on both sides + per-bucket merge inside map_groups) —
  exercised by the postings shuffle itself; a general helper is
  :func:`bucketed_join`.
* :func:`asof_join` — per-key temporal as-of join (each left row matched
  to the most recent right row with right.ts <= left.ts), an operator
  Ray Data lacks natively: ONE key shuffle, then a vectorized
  ``searchsorted`` merge inside each group.
* :func:`range_join` — big side against a SMALL table of non-overlapping
  half-open ranges: broadcast the ranges once, bin each batch with
  ``searchsorted``. No shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


class _BroadcastJoiner:
    def __init__(self, small_ref, on: str, how: str):
        self.small = ray.get(small_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def broadcast_join(big_ds, small_df: pd.DataFrame, on: str, how: str = "inner", concurrency: int = 4):
    """Join a big Dataset against a small pandas table without a shuffle."""
    ref = ray.put(small_df)
    return big_ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, on, how),
        batch_format="pandas",
        concurrency=concurrency,
    )


def bucketed_join(left_ds, right_ds, on: str, num_buckets: int = 32, how: str = "inner"):
    """Both-sides-large hash join: bucket each side by ``hash(key) %
    num_buckets`` and merge matching buckets inside ``map_groups``.
    Keys are hashed with a stable function (Knuth multiplicative) so
    bucketing is deterministic across processes."""

    left_cols = [c for c in left_ds.schema().names]
    right_cols = [c for c in right_ds.schema().names]
    l_schema = {n: t for n, t in zip(left_ds.schema().names, left_ds.schema().types)}
    r_schema = {n: t for n, t in zip(right_ds.schema().names, right_ds.schema().types)}
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    # integer-key contract: the bucket hash is a Knuth multiplicative
    # hash over int64 keys; string keys would crash mid-task and float
    # keys would collide after truncation (code-review r05 finding)
    for side_schema, side_name in ((l_schema, "left"), (r_schema, "right")):
        if on in side_schema and not pa.types.is_integer(side_schema[on]):
            raise TypeError(
                f"bucketed_join: key column {on!r} on the {side_name} side "
                f"is {side_schema[on]} — integer keys required (hash or "
                "factorize string keys first)")

    def add_bucket(b: pa.Table, side: str) -> pa.Table:
        keys = b[on].to_numpy(zero_copy_only=False).astype(np.int64)
        # Knuth multiplicative hash (not crc32) over the int64 key
        bucket = (keys * 2654435761 % (2**31)) % num_buckets
        cols = {}
        for c in all_cols:
            if c in b.column_names:
                cols[c] = b[c]
            else:
                typ = r_schema.get(c) or l_schema.get(c)
                cols[c] = pa.nulls(len(b), typ)
        t = pa.table(cols)
        t = t.append_column("__bucket", pa.array(bucket.astype(np.int32)))
        return t.append_column("__side", pa.array([side] * len(b), pa.string()))

    tagged = left_ds.map_batches(lambda b: add_bucket(b, "l"), batch_format="pyarrow").union(
        right_ds.map_batches(lambda b: add_bucket(b, "r"), batch_format="pyarrow")
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == "l"][left_cols]
        rf = g[g["__side"] == "r"][right_cols]
        return lf.merge(rf, on=on, how=how)

    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def _ts_int64(s: pd.Series) -> np.ndarray:
    """Timestamp-or-numeric column → comparable int64 (µs for datetimes)."""
    if np.issubdtype(s.dtype, np.datetime64):
        return s.to_numpy().astype("datetime64[us]").astype(np.int64)
    return s.to_numpy().astype(np.int64)


def asof_join(left_ds, right_ds, key: str, ts: str, how: str = "inner", rsuffix: str = "_r"):
    """Temporal as-of join: each left row matched to the single right row
    with the same ``key`` and the greatest right ``ts`` <= left ``ts``
    (DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` backward semantics).

    Ray-Data shape: tag both sides, ``union``, ONE hash shuffle on the
    key, then a per-group vectorized merge (sort right by ts once,
    ``np.searchsorted(right_ts, left_ts, 'right') - 1``) — no nested
    loops, no global sort. Partitioning assumption (document per the
    custom-operator rule): one key's rows fit in one worker's group; a
    pathologically hot key would need time-range salting with boundary
    replication (split the key's timeline into ranges, replicate each
    range's last right row into the next range's group).

    Tie rule: equal right ``ts`` within a key resolves to the LAST row
    in a stable sort of the right side (deterministic given unique
    (key, ts), which the caller should ensure).

    Right columns (except key/ts) are appended, renamed with ``rsuffix``
    on collision; ``how="left"`` keeps unmatched left rows with nulls.
    """
    if how not in ("inner", "left"):
        # anything else silently ran as inner before (code-review r05)
        raise ValueError(f"asof_join: how={how!r} not supported (inner|left)")
    left_cols = list(left_ds.schema().names)
    right_cols = list(right_ds.schema().names)
    l_schema = dict(zip(left_ds.schema().names, left_ds.schema().types))
    r_schema = dict(zip(right_ds.schema().names, right_ds.schema().types))
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]
    out_right = [c for c in right_cols if c != key]
    ren = {c: (c + rsuffix if c in left_cols else c) for c in out_right}

    def tag(b: pa.Table, side: str) -> pa.Table:
        cols = {}
        for c in all_cols:
            if c in b.column_names:
                cols[c] = b[c]
            else:
                cols[c] = pa.nulls(len(b), r_schema.get(c) or l_schema.get(c))
        t = pa.table(cols)
        return t.append_column("__side", pa.array([side] * len(b), pa.string()))

    tagged = left_ds.map_batches(lambda b: tag(b, "l"), batch_format="pyarrow").union(
        right_ds.map_batches(lambda b: tag(b, "r"), batch_format="pyarrow")
    )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == "l"][left_cols]
        rf = g[g["__side"] == "r"][right_cols]
        if len(rf) == 0:
            matched = np.zeros(len(lf), dtype=bool)
            pos = np.full(len(lf), -1, dtype=np.int64)
        else:
            rf = rf.iloc[np.argsort(_ts_int64(rf[ts]), kind="stable")]
            pos = np.searchsorted(_ts_int64(rf[ts]), _ts_int64(lf[ts]), side="right") - 1
            matched = pos >= 0
        out = (lf if how == "left" else lf[matched]).reset_index(drop=True).copy()
        pos_out = pos if how == "left" else pos[matched]
        for c in out_right:
            if len(rf) == 0:
                col = pd.Series([None] * len(out), dtype=object)
            else:
                col = pd.Series(rf[c].to_numpy()[np.maximum(pos_out, 0)])
                if how == "left":
                    col[pos_out < 0] = None
            out[ren[c]] = col
        return out

    return tagged.groupby(key).map_groups(merge_group, batch_format="pandas")


class _RangeJoiner:
    def __init__(self, ranges_ref, on: str, lo: str, hi: str, how: str):
        r = ray.get(ranges_ref).sort_values(lo).reset_index(drop=True)
        los = r[lo].to_numpy(dtype=np.float64)
        his = r[hi].to_numpy(dtype=np.float64)
        if not (his > los).all() or (los[1:] < his[:-1]).any():
            raise ValueError("range_join requires non-overlapping half-open [lo, hi) ranges")
        self.r, self.los, self.his = r, los, his
        self.on, self.lo, self.hi, self.how = on, lo, hi, how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[self.on].to_numpy(dtype=np.float64)
        if len(self.r) == 0:  # no ranges: inner drops everything, left all-null
            if self.how != "left":
                return batch.iloc[0:0].assign(**{c: [] for c in self.r.columns
                                                 if c not in (self.lo, self.hi)})
            out = batch.copy()
            for c in self.r.columns:
                if c not in (self.lo, self.hi):
                    out[c] = None
            return out
        pos = np.searchsorted(self.los, v, side="right") - 1
        ok = (pos >= 0) & (v < self.his[np.maximum(pos, 0)])
        out = batch.copy() if self.how == "left" else batch[ok].reset_index(drop=True).copy()
        pos_out = pos if self.how == "left" else pos[ok]
        attach = self.r.drop(columns=[self.lo, self.hi]).iloc[np.maximum(pos_out, 0)].reset_index(drop=True)
        if self.how == "left":
            attach[~ok] = None
        for c in attach.columns:
            out[c] = attach[c].to_numpy()
        return out


def range_join(big_ds, ranges_df: pd.DataFrame, on: str, lo: str = "lo", hi: str = "hi",
               how: str = "inner", concurrency: int = 4):
    """Join a big Dataset against a SMALL table of non-overlapping
    half-open ``[lo, hi)`` ranges on ``big[on]`` — the broadcast range
    join (tiering/binning). The ranges ship via ``ray.put`` once;
    each batch bins with one ``searchsorted``. No shuffle. For a
    large-large range join, interval-bucket both sides instead."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how={how!r} not supported (inner|left)")
    ref = ray.put(ranges_df)
    return big_ds.map_batches(
        _RangeJoiner,
        fn_constructor_args=(ref, on, lo, hi, how),
        batch_format="pandas",
        concurrency=concurrency,
    )


def skew_join(left_ds, right_ds, on: str, hot_threshold: int = 10_000,
              num_buckets: int = 32, max_hot_right_rows: int = 5_000_000):
    """Skew-aware inner equality join: the brief's "salt hot keys"
    pattern as a reusable operator. A plain hash join sends EVERY row of
    a hot key to one reducer — the curse-of-the-last-reducer straggler.
    Here:

    1. EXACT left-side key counts (per-batch Arrow partials → one
       key-cardinality-sized groupby) pick the hot set
       ``{k : count(k) > hot_threshold}``. Deterministic — no sampling
       noise in the plan, so results and even the split are
       retry/batching stable. The ``c > hot_threshold`` filter is
       applied INSIDE the dataset, so only the (tiny) hot-key rows ever
       reach the driver — the distinct-key table itself never does.
    2. Hot keys take the BROADCAST path: their right-side rows (bounded:
       a hot key must be dimension-like on the right — enforced by
       ``max_hot_right_rows``, which raises loudly instead of silently
       pinning an unbounded frame) ship once via ``ray.put``; hot left
       rows join inside their own map task and NEVER enter the shuffle.
    3. Cold keys take the normal bucketed hash join.

    The union is row-identical to a plain inner join (pytest-asserted
    against ``bucketed_join``), only the partitioning differs. The hot
    set ships to the filter closures as ONE sorted numpy array built
    once (``np.isin`` against a pre-sorted array, no per-batch
    list conversion).
    """
    import ray
    from ray.data.aggregate import Sum

    def count_partial(b: pa.Table) -> pa.Table:
        g = pa.table({on: b[on]}).group_by(on).aggregate([([], "count_all")])
        return pa.table({on: g[on], "c_p": g["count_all"].cast(pa.int64())})

    def keep_hot(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater(b["c"], pa.scalar(hot_threshold, pa.int64())))

    hot_keys = (
        left_ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby(on).aggregate(Sum("c_p", alias_name="c"))
        .map_batches(keep_hot, batch_format="pyarrow")
        .to_pandas()
    )
    hot_arr = np.sort(hot_keys[on].to_numpy()) if len(hot_keys) else None

    if hot_arr is not None and hot_arr.size:
        hot_right = right_ds.map_batches(
            lambda b: b.filter(pa.array(np.isin(
                b[on].to_numpy(zero_copy_only=False), hot_arr))),
            batch_format="pyarrow").to_pandas()
        if len(hot_right) > max_hot_right_rows:
            raise ValueError(
                f"skew_join: hot right side has {len(hot_right)} rows > "
                f"max_hot_right_rows={max_hot_right_rows}; the broadcast "
                f"contract requires a dimension-like right side for hot keys")
        hr_ref = ray.put(hot_right)

        def join_hot(b: pa.Table) -> pd.DataFrame:
            keys = b[on].to_numpy(zero_copy_only=False)
            m = np.isin(keys, hot_arr)
            lf = b.filter(pa.array(m)).to_pandas()
            return lf.merge(ray.get(hr_ref), on=on, how="inner")

        hot_joined = left_ds.map_batches(join_hot, batch_format="pyarrow")
        cold_left = left_ds.map_batches(
            lambda b: b.filter(pa.array(~np.isin(
                b[on].to_numpy(zero_copy_only=False), hot_arr))),
            batch_format="pyarrow")
        cold_right = right_ds.map_batches(
            lambda b: b.filter(pa.array(~np.isin(
                b[on].to_numpy(zero_copy_only=False), hot_arr))),
            batch_format="pyarrow")
    else:
        hot_joined = None
        cold_left, cold_right = left_ds, right_ds

    cold_joined = bucketed_join(cold_left, cold_right, on=on,
                                num_buckets=num_buckets, how="inner")
    return cold_joined.union(hot_joined) if hot_joined is not None else cold_joined


def bloom_prefilter_stats(left_ds, key_col: str, right_keys,
                          m_bits: int = 8192) -> pd.DataFrame:
    """Bloom-filter join pushdown (the classic distributed-join
    optimization: ship a small bit array instead of the build side, let
    probe rows that cannot match die before the shuffle): build a
    k=2-hash Bloom filter of the build-side keys, broadcast it, and
    report the probe-side accounting — rows scanned, rows passing the
    filter, true matches, and false positives.

    Hash family is the repo's md5_number_upper parity contract
    (``h1 = md5(key) % m``, ``h2 = md5(key || '#') % m``), so the PASS
    SET — including the false positives, which are a deterministic
    function of the bit layout — is exactly SQL-reproducible; the
    false-positive rate is measured, not estimated. ONE streaming pass
    over the probe side (per-batch distinct-key factorize → two md5s
    per distinct key, vectorized bit probes), zero shuffles; the filter
    and the true-match key set ship once via ``ray.put``.
    """
    import hashlib

    import ray
    from ray.data.aggregate import Sum

    from hybrid_sanctions_search_engine_ray.functions.hashing import factorize_exact

    def _h(s: str, salt: str = "") -> int:
        return int.from_bytes(
            hashlib.md5((s + salt).encode("utf-8")).digest()[:8],
            "little") % m_bits

    rkeys = sorted({str(k) for k in right_keys})
    bits = np.zeros(m_bits, dtype=bool)
    for k in rkeys:
        bits[_h(k)] = True
        bits[_h(k, "#")] = True
    state = ray.put({"bits": bits,
                     "rset": np.array(rkeys, dtype=object)})

    def probe(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        st = ray.get(state)
        keys = pc.cast(b[key_col], pa.string())
        codes, uniques = factorize_exact(keys)
        h1 = np.fromiter((_h(u) for u in uniques), dtype=np.int64,
                         count=len(uniques))
        h2 = np.fromiter((_h(u, "#") for u in uniques), dtype=np.int64,
                         count=len(uniques))
        upass = st["bits"][h1] & st["bits"][h2]
        utrue = np.isin(np.asarray(uniques, dtype=object), st["rset"])
        npass = int(upass[codes].sum())
        ntrue = int(utrue[codes].sum())
        return pa.table({"n_left": pa.array([len(b)], pa.int64()),
                         "n_pass": pa.array([npass], pa.int64()),
                         "n_true": pa.array([ntrue], pa.int64())})

    tot = (left_ds.map_batches(probe, batch_format="pyarrow")
           .aggregate(Sum("n_left", alias_name="n_left"),
                      Sum("n_pass", alias_name="n_bloom_pass"),
                      Sum("n_true", alias_name="n_true_match")))
    n_left = int(tot["n_left"])
    n_pass = int(tot["n_bloom_pass"])
    n_true = int(tot["n_true_match"])
    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away

    fpr = 0.0 if n_left == n_true else \
        float(round_half_away(np.array(
            [(n_pass - n_true) / (n_left - n_true) * 1e4]), 0)[0] / 1e4)
    return pd.DataFrame({
        "n_left": [np.int64(n_left)],
        "n_bloom_pass": [np.int64(n_pass)],
        "n_true_match": [np.int64(n_true)],
        "n_false_pos": [np.int64(n_pass - n_true)],
        "false_pos_rate": [fpr],
    })
