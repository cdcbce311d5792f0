"""Deterministic sampling operators for training-data pipelines.

Sampling at 100-TB scale must be (a) a pure per-batch filter — no
shuffle, no coordination, no RNG state — and (b) reproducible across
runs/retries/resumes. Hash sampling gives both: a row is kept iff
``bucket(md5(key || salt)) < rate``, so membership is a property of the
row itself. Changing ``salt`` draws an independent sample; the same
salt always reproduces the same subset (and a task retry re-selects
exactly the same rows — the resume property every other stage relies
on).

Parity: the 64-bit bucket is the little-endian first 8 md5 bytes —
exactly DuckDB's ``md5_number_upper(text)`` — so samples are
SQL-checkable (the driver oracle gate). The per-row ``hashlib`` loop is
the price of that oracle parity (same tradeoff as
``stages/dedup.add_md5``); swap in ``functions/hashing``'s vectorized
path when parity is not needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket100(keys: list, salt: str) -> np.ndarray:
    """Per-key bucket in [0, 100): md5_number_upper(str(key)+salt) % 100."""
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        d = hashlib.md5((str(k) + salt).encode("utf-8")).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return out % np.uint64(100)


def hash_sample(ds, key: str, rate_pct: int, salt: str = ""):
    """Keep ~``rate_pct``% of rows, deterministically by ``key``.

    Pure map_batches filter — streams, no shuffle, reproducible.
    Rows with equal keys are kept or dropped together (useful for
    sampling whole conversations/users by their id).
    """
    if not 0 <= rate_pct <= 100:
        raise ValueError("rate_pct must be in [0, 100]")

    def f(b: pa.Table) -> pa.Table:
        keep = _bucket100(b[key].to_pylist(), salt) < rate_pct
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_hash_sample(ds, key: str, strata: str, rates: dict, salt: str = "",
                           default_pct: int = 0):
    """Per-stratum deterministic sampling: row kept iff its key bucket
    < ``rates[row[strata]]`` (``default_pct`` for unlisted strata).
    The standard rebalancing move (downsample the dominant language /
    source / quality tier) as one streaming filter — no shuffle."""
    for v in rates.values():
        if not 0 <= v <= 100:
            raise ValueError("rates must be in [0, 100]")

    def f(b: pa.Table) -> pa.Table:
        bucket = _bucket100(b[key].to_pylist(), salt)
        svals = b[strata].to_pylist()
        cut = np.fromiter((rates.get(s, default_pct) for s in svals), dtype=np.uint64,
                          count=len(svals))
        return b.filter(pa.array(bucket < cut))

    return ds.map_batches(f, batch_format="pyarrow")


def inverse_sqrt_rates(counts: dict[str, int], max_pct: int = 100) -> dict[str, int]:
    """Temperature-style source rebalancing rates (T = 0.5): the rarest
    stratum keeps 100%, a stratum k× larger keeps ~100/sqrt(k)% — the
    standard training-mix upweighting of rare sources, with integer
    percent rates so membership stays hash-sampling exact. The formula
    ``min(max, ceil(100 · sqrt(cmin / c)))`` uses only correctly-rounded
    IEEE ops on the same inputs, so a SQL twin computes bit-identical
    rates (no cross-source float sum whose order could flip a floor)."""
    import math

    if not counts:
        return {}
    cmin = min(counts.values())
    return {
        s: min(max_pct, math.ceil(100.0 * math.sqrt(cmin / c)))
        for s, c in counts.items()
    }


def temperature_mix(ds, key: str, strata: str, salt: str = "") -> "object":
    """End-to-end source mixing: per-stratum counts (tiny shuffle) →
    inverse-sqrt rates → one deterministic hash-sampling pass → per-
    stratum audit rows (stratum, n_total, rate_pct, n_sampled). The
    corpus streams twice and never shuffles; the audit result is
    strata-sized."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def cpartial(b: pa.Table) -> pa.Table:
        g = b.select([strata]).group_by(strata).aggregate([([], "count_all")])
        return g.rename_columns([strata, "c_p"])

    totals = (
        ds.map_batches(cpartial, batch_format="pyarrow")
        .groupby(strata)
        .aggregate(Sum("c_p", alias_name="n_total"))
        .to_pandas()
    )
    if totals.empty:  # empty Dataset loses columns on to_pandas
        return pd.DataFrame({strata: pd.Series([], dtype=object),
                             "n_total": pd.Series([], dtype=np.int64),
                             "rate_pct": pd.Series([], dtype=np.int64),
                             "n_sampled": pd.Series([], dtype=np.int64)})
    counts = dict(zip(totals[strata], totals["n_total"].astype(int)))
    rates = inverse_sqrt_rates(counts)
    sampled = stratified_hash_sample(ds, key, strata, rates, salt=salt)
    got = (
        sampled.map_batches(cpartial, batch_format="pyarrow")
        .groupby(strata)
        .aggregate(Sum("c_p", alias_name="n_sampled"))
        .to_pandas()
    )
    if got.empty:  # empty Dataset loses columns on to_pandas
        got = pd.DataFrame({strata: pd.Series([], dtype=object),
                            "n_sampled": pd.Series([], dtype=np.int64)})
    out = totals.merge(got, on=strata, how="left")
    out["n_sampled"] = out["n_sampled"].fillna(0).astype(np.int64)
    out["n_total"] = out["n_total"].astype(np.int64)
    out["rate_pct"] = out[strata].map(rates).astype(np.int64)
    return out[[strata, "n_total", "rate_pct", "n_sampled"]]


def dataset_split(ds, key: str, splits: dict[str, int], salt: str = ""):
    """Deterministic train/val/test assignment: ``splits`` maps split
    name → percent (must sum to 100); a row lands in the split whose
    cumulative-percent interval contains its key bucket. Same
    hash-membership contract as the samplers — assignment is a property
    of the row (reproducible across runs, retries and resumes; rows with
    equal keys land together), and the split column is added in ONE
    streaming pass with no shuffle. Split boundaries follow the SORTED
    split names so engine and SQL twin agree on interval order."""
    for name, pct in splits.items():
        if not (isinstance(pct, (int, np.integer)) and 0 <= pct <= 100):
            raise ValueError(f"split {name!r} percent must be an int in [0, 100]")
    if sum(splits.values()) != 100:
        raise ValueError("split percents must sum to 100")
    names = sorted(splits)
    edges = np.cumsum([splits[n] for n in names]).astype(np.uint64)

    def f(b: pa.Table) -> pa.Table:
        bucket = _bucket100(b[key].to_pylist(), salt)
        idx = np.searchsorted(edges, bucket, side="right")
        col = pa.array(np.array(names, dtype=object)[idx], pa.string())
        return b.append_column("split", col)

    return ds.map_batches(f, batch_format="pyarrow")


def weighted_sample(ds, key: str, weight_col: str, n: int, salt: str = "-ws"):
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis (A-ES) scheme with a HASH-derived uniform, so
    membership is again a pure property of the row (reproducible across
    runs/retries, no RNG state, SQL-checkable): per row
    ``u = (md5_bucket(key+salt) % 1e6 + 1) / (1e6 + 1)`` ∈ (0,1),
    sample key ``k = ln(u) / w`` (order-equivalent to the classic
    ``u^(1/w)``), keep the global top-``n`` by (k desc, key asc).
    Heavier rows draw systematically larger keys. Per-batch top-``n``
    partials stream to ONE driver-side merge of O(#batches·n) rows.
    Weights must be > 0."""
    import pandas as pd

    def partial(b):
        import pyarrow as pa

        keys = b[key].to_numpy(zero_copy_only=False)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if (w <= 0).any():
            raise ValueError("weighted_sample requires strictly positive weights")
        buckets = np.empty(len(keys), dtype=np.uint64)
        for i, kv in enumerate(keys):
            d = hashlib.md5((str(kv) + salt).encode("utf-8")).digest()
            buckets[i] = int.from_bytes(d[:8], "little")
        u = ((buckets % np.uint64(1_000_000)).astype(np.float64) + 1.0) / 1_000_001.0
        sk = np.log(u) / w
        # tie-break by key ASC inside the partial too — argsort by sk
        # alone prunes ties in batch row order, which can discard the
        # (sk desc, key asc) contract winner before the driver merge
        # sees it (code-review r05 finding)
        top = np.lexsort((keys, -sk))[:n]
        return pa.table({key: pa.array(keys[top]),
                         "sample_key": pa.array(sk[top]),
                         weight_col: pa.array(w[top])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["sample_key", key], ascending=[False, True],
                              kind="mergesort").head(n).reset_index(drop=True)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int32)
    return pd.DataFrame({key: parts[key], "rank": parts["rank"],
                         "sample_key": np.round(parts["sample_key"].to_numpy(), 6),
                         weight_col: parts[weight_col]})


def sliced_scan(ds, key: str, n_slices: int, salt: str = "-sl") -> "pd.DataFrame":
    """ES sliced scroll (``slice: {id, max}``): a scan is split into
    ``n_slices`` disjoint, collectively-exhaustive slices by a stable
    hash of ``key`` so independent clients (or cluster nodes) can export
    a corpus in parallel without coordination — the canonical parallel
    reindex/export primitive (ES ``_search?scroll`` slicing).

    Membership is a pure row property (md5 bucket % n_slices — the same
    DuckDB ``md5_number_upper`` parity as hash_sample), so a retried or
    resumed slice re-selects exactly the same rows. This function
    returns the per-slice manifest — (slice_id, doc_count, min/max/sum
    of ``key``) — computed as per-batch partials + one slices-sized
    shuffle; a consumer materializes a single slice with the same
    predicate as a map_batches filter (never a shuffle).
    """
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    if n_slices < 1:
        raise ValueError("n_slices must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key].to_pylist()
        buckets = np.empty(len(keys), dtype=np.uint64)
        for i, kv in enumerate(keys):
            d = hashlib.md5((str(kv) + salt).encode("utf-8")).digest()
            buckets[i] = int.from_bytes(d[:8], "little")
        sl = (buckets % np.uint64(n_slices)).astype(np.int64)
        try:
            kv = np.asarray(keys, dtype=np.int64)
        except (ValueError, TypeError, OverflowError):
            raise TypeError(
                "sliced_scan: slice manifests carry min/max/sum of the "
                "key, which requires INTEGER keys — string-keyed corpora "
                "need a numeric surrogate (the slice assignment itself "
                "hashes any key; code-review r05 finding)") from None
        t = pa.table({"slice_id": pa.array(sl), "k": pa.array(kv)})
        g = t.group_by(["slice_id"]).aggregate(
            [("k", "min"), ("k", "max"), ("k", "sum"), ([], "count_all")]
        )
        return pa.table({
            "slice_id": g["slice_id"],
            "mn_p": g["k_min"], "mx_p": g["k_max"],
            "sum_p": g["k_sum"],
            "c_p": pc.cast(g["count_all"], pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("slice_id")
        .aggregate(Min("mn_p", alias_name="min_id"),
                   Max("mx_p", alias_name="max_id"),
                   Sum("sum_p", alias_name="sum_id"),
                   Sum("c_p", alias_name="doc_count"))
    )
    df = agg.to_pandas()
    if df.empty:  # empty Dataset → to_pandas() drops columns; restore
        return pd.DataFrame({"slice_id": pd.Series([], dtype=np.int64),
                             "doc_count": pd.Series([], dtype=np.int64),
                             "min_id": pd.Series([], dtype=np.int64),
                             "max_id": pd.Series([], dtype=np.int64),
                             "sum_id": pd.Series([], dtype=np.int64)})
    df = df.sort_values("slice_id", kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({
        "slice_id": df["slice_id"].astype(np.int64),
        "doc_count": df["doc_count"].astype(np.int64),
        "min_id": df["min_id"].astype(np.int64),
        "max_id": df["max_id"].astype(np.int64),
        "sum_id": df["sum_id"].astype(np.int64),
    })
