"""Sketch pipelines: one serialized sketch per ``map_batches`` task,
merged in a driver-side reduce — the mergeable-sketch aggregation
pattern (ray_guide "Aggregation at scale"). Sketch payload rows are a
few KB each; nothing corpus-sized ever shuffles."""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.functions.sketches import HyperLogLog, SpaceSaving, fmix64
from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms


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

    rows = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192).take_all()
    merged = None
    for r in rows:
        s = pickle.loads(r["sketch"])
        merged = s if merged is None else merged.merge(s)
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

    rows = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192).take_all()
    merged = None
    for r in rows:
        s = pickle.loads(r["sketch"])
        merged = s if merged is None else merged.merge(s)
    return merged.estimate() if merged is not None else 0.0
