"""Sketch pipelines: one serialized sketch per ``map_batches`` task,
combined by a distributed TREE reduce — the mergeable-sketch
aggregation pattern (ray_guide "Aggregation at scale"). Sketch payload
rows are a few KB each; nothing corpus-sized ever shuffles, and the
driver only ever unpickles the single final sketch (a sequential
driver-side merge loop would be O(#tasks) Python at 100-TB task
counts)."""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.functions.sketches import HyperLogLog, SpaceSaving, fmix64
from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms


def _merge_sketch_batch(batch: pa.Table) -> pa.Table:
    sketches = [pickle.loads(p.as_py()) for p in batch["sketch"]]
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.merge(s)
    return pa.table({"sketch": pa.array([pickle.dumps(merged)], pa.binary())})


def tree_merge_sketches(sketch_ds, fanin: int = 32):
    """Reduce a Dataset of pickled-sketch rows to ONE sketch via rounds
    of fan-in merges (each round materializes only KB-sized sketch rows;
    log_fanin(#tasks) rounds). Returns the final sketch or None."""
    ds = sketch_ds.materialize()  # sketch rows only — tiny
    while ds.count() > 1:
        ds = ds.map_batches(
            _merge_sketch_batch, batch_format="pyarrow", batch_size=fanin
        ).materialize()
    rows = ds.take_all()
    return pickle.loads(rows[0]["sketch"]) if rows else None


def top_terms_sketch(ds, cfg: AnalyzerConfig, capacity: int = 4096, k: int = 50):
    """Approximate corpus-wide top-k terms via SpaceSaving.

    Returns a pandas DataFrame (term, est_count, max_error); exact for
    entries with max_error == 0 (always true for a sufficiently skewed
    head, which is what top-k is for)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        _, terms = flat_terms(batch, cfg)
        ss = SpaceSaving(capacity)
        if len(terms):
            t = terms.to_numpy(zero_copy_only=False)
            ss.add_many(t)
        return pa.table({"sketch": pa.array([pickle.dumps(ss)], pa.binary())})

    merged = tree_merge_sketches(ds.map_batches(partial, batch_format="pyarrow", batch_size=8192))
    if merged is None:
        return pd.DataFrame({"term": [], "est_count": [], "max_error": []})
    top = merged.topk(k)
    return pd.DataFrame(
        {
            "term": [t for t, _, _ in top],
            "est_count": np.array([c for _, c, _ in top], dtype=np.int64),
            "max_error": np.array([e for _, _, e in top], dtype=np.int64),
        }
    )


def distinct_terms_hll(ds, cfg: AnalyzerConfig, p: int = 12) -> float:
    """Approximate distinct-term count via HyperLogLog (±~1.6 %)."""
    from hybrid_sanctions_search_engine_ray.stages.dedup import _token_hashes

    def partial(batch: pa.Table) -> pa.Table:
        _, terms = flat_terms(batch, cfg)
        hll = HyperLogLog(p)
        if len(terms):
            th = _token_hashes(terms.to_numpy(zero_copy_only=False))
            hll.add_hashes(fmix64(th))
        return pa.table({"sketch": pa.array([pickle.dumps(hll)], pa.binary())})

    merged = tree_merge_sketches(ds.map_batches(partial, batch_format="pyarrow", batch_size=8192))
    return merged.estimate() if merged is not None else 0.0


def approx_quantiles_sketch(ds, col: str, qs: list[float], k: int = 256):
    """Approximate quantiles of a CONTINUOUS column: one QuantileSketch
    per batch → tree merge → driver reads qs off the single final
    sketch. Nothing corpus-sized shuffles; the sketch rows are KBs."""
    import pandas as pd

    from hybrid_sanctions_search_engine_ray.functions.sketches import QuantileSketch

    def partial(batch: pa.Table) -> pa.Table:
        qsk = QuantileSketch(k)
        qsk.add_many(batch[col].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([pickle.dumps(qsk)], pa.binary())})

    merged = tree_merge_sketches(ds.map_batches(partial, batch_format="pyarrow", batch_size=16384))
    if merged is None or merged.n == 0:
        return pd.DataFrame({"q": [], "value": []})
    return pd.DataFrame({"q": np.asarray(qs, dtype=np.float64),
                         "value": [merged.quantile(q) for q in qs]})


def cm_sketch_counts(ds, cfg: AnalyzerConfig, query_terms: list[str],
                     depth: int = 4, width: int = 2048) -> "pd.DataFrame":
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of corpus term
    frequencies, answered for ``query_terms``: est(t) = min over the
    ``depth`` rows of the counter at bucket
    ``md5_number_upper(r || ':' || t) % width`` (the repo-wide DuckDB-
    parity hash, salted per row).

    Unlike SpaceSaving there is no capacity-exactness gate — CM
    OVERCOUNTS on collisions by design — but the whole sketch is
    deterministic given the hash family, so the estimate itself
    (collisions included) is exactly SQL-twinnable: the oracle rebuilds
    every row's bucket sums from the tf CTE and takes the same min.

    Scale shape: per-batch local d×W partial counters → ONE bounded
    (row, bucket)-keyed exchange (≤ d·W rows per batch, never
    token-sized); the queried lookup touches ``depth`` counters per
    term. Returns (term, est) with est ≥ the true count (CM guarantee,
    property-tested).
    """
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Sum

    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    def _bucket_all(terms_np: np.ndarray, r: int) -> np.ndarray:
        from hybrid_sanctions_search_engine_ray.functions.hashing import factorize_exact

        codes, uniques = factorize_exact(terms_np)
        uh = np.empty(len(uniques), dtype=np.uint64)
        for i, u in enumerate(uniques):
            s = f"{r}:{u if isinstance(u, str) else ''}".encode("utf-8")
            uh[i] = int.from_bytes(hashlib.md5(s).digest()[:8], "little")
        return (uh % np.uint64(width)).astype(np.int64)[codes]

    def partial(b: pa.Table) -> pa.Table:
        _, terms = flat_terms(b, cfg)
        t_np = terms.to_numpy(zero_copy_only=False) if hasattr(terms, "to_numpy") else np.asarray(terms)
        rows, buckets, counts = [], [], []
        for r in range(depth):
            bk = _bucket_all(t_np, r)
            cnt = np.bincount(bk, minlength=width).astype(np.int64)
            nz = np.flatnonzero(cnt)
            rows.append(np.full(nz.size, r, dtype=np.int64))
            buckets.append(nz.astype(np.int64))
            counts.append(cnt[nz])
        return pa.table({
            "r": pa.array(np.concatenate(rows) if rows else np.empty(0, np.int64)),
            "bucket": pa.array(np.concatenate(buckets) if buckets else np.empty(0, np.int64)),
            "c_p": pa.array(np.concatenate(counts) if counts else np.empty(0, np.int64)),
        })

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["r", "bucket"])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
    )
    cm = np.zeros((depth, width), dtype=np.int64)
    if len(grid):
        cm[grid["r"].to_numpy(), grid["bucket"].to_numpy()] = grid["c"].to_numpy()
    ests = []
    for t in query_terms:
        vals = []
        for r in range(depth):
            h = int.from_bytes(hashlib.md5(f"{r}:{t}".encode()).digest()[:8], "little")
            vals.append(cm[r, h % width])
        ests.append(int(min(vals)))
    import pandas as pd  # noqa: F811

    return pd.DataFrame({"term": query_terms, "est": np.array(ests, dtype=np.int64)}
                        ).sort_values("term", kind="mergesort").reset_index(drop=True)
