"""geo_pairs spatial self-join vs brute force (incl. cross-cell pairs)
and Count-Min sketch properties (overcount guarantee, exactness at
collision-free width, brute parity)."""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.geo import _LAT_P, _LON_P, geo_pairs
from hybrid_sanctions_search_engine_ray.stages.sketch_ops import cm_sketch_counts


def _brute_pairs(keys: np.ndarray, d: int) -> set[tuple[int, int]]:
    la = (keys * _LAT_P) % 180000
    lo = (keys * _LON_P) % 360000
    d2 = (la[:, None] - la) ** 2 + (lo[:, None] - lo) ** 2
    ok = (d2 <= d * d) & (keys[:, None] < keys)
    ai, bi = np.nonzero(ok)
    return {(int(keys[a]), int(keys[b])) for a, b in zip(ai, bi)}


@pytest.mark.parametrize("dist", [6000, 20000])
def test_geo_pairs_matches_bruteforce(ray_session, dist):
    import ray.data as rd

    keys = np.arange(1, 1200, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(5)
    out = geo_pairs(ds, "k", max_dist_milli=dist).to_pandas()
    got = set(zip(out.key_a.astype(int), out.key_b.astype(int)))
    exp = _brute_pairs(keys, dist)
    assert got == exp and len(exp) > 0
    # no duplicate emissions from the 9-cell replication
    assert len(out) == len(got)
    # at least one found pair must CROSS a cell boundary (the replication
    # path), otherwise this test wouldn't cover it
    la = (keys * _LAT_P) % 180000
    lo = (keys * _LON_P) % 360000
    cell = {int(k): (int(a) // dist, int(o) // dist)
            for k, a, o in zip(keys, la, lo)}
    assert any(cell[a] != cell[b] for a, b in exp)


def test_geo_pairs_d2_values(ray_session):
    import ray.data as rd

    keys = np.arange(1, 800, dtype=np.int64)
    out = geo_pairs(rd.from_pandas(pd.DataFrame({"k": keys})), "k",
                    max_dist_milli=25000).to_pandas()
    la = (keys * _LAT_P) % 180000
    lo = (keys * _LON_P) % 360000
    pos = {int(k): (int(a), int(o)) for k, a, o in zip(keys, la, lo)}
    for _, r in out.head(50).iterrows():
        (a1, o1), (a2, o2) = pos[int(r.key_a)], pos[int(r.key_b)]
        assert int(r.d2) == (a1 - a2) ** 2 + (o1 - o2) ** 2 <= 25000**2


def _cm_brute(texts, terms, depth, width):
    cfg_counts: Counter = Counter()
    for s in texts:
        for t in s.lower().split():
            if t:
                cfg_counts[t] += 1
    cm = np.zeros((depth, width), dtype=np.int64)
    for t, c in cfg_counts.items():
        for r in range(depth):
            h = int.from_bytes(hashlib.md5(f"{r}:{t}".encode()).digest()[:8], "little")
            cm[r, h % width] += c
    out = {}
    for t in terms:
        out[t] = min(cm[r, int.from_bytes(hashlib.md5(f"{r}:{t}".encode()).digest()[:8], "little") % width]
                     for r in range(depth))
    return cfg_counts, out


def _tds(texts, ray_session):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(3)


TEXTS = ["a b c a", "b c d", "a a a e", "f g a b", "h i j k l m"] * 7


def test_cm_sketch_brute_parity(ray_session):
    probes = ["a", "b", "m", "zzz"]
    out = cm_sketch_counts(_tds(TEXTS, ray_session), AnalyzerConfig(mode="simple"),
                           probes, depth=3, width=8)  # tiny width → collisions
    _, exp = _cm_brute(TEXTS, probes, 3, 8)
    assert dict(zip(out.term, out.est.astype(int))) == exp


def test_cm_sketch_overcounts_never_under(ray_session):
    probes = ["a", "b", "c", "d", "e", "zzz"]
    out = cm_sketch_counts(_tds(TEXTS, ray_session), AnalyzerConfig(mode="simple"),
                           probes, depth=4, width=16)
    true, _ = _cm_brute(TEXTS, probes, 4, 16)
    for t, est in zip(out.term, out.est.astype(int)):
        assert est >= true.get(t, 0)


def test_cm_sketch_exact_at_wide_width(ray_session):
    probes = ["a", "b", "h"]
    out = cm_sketch_counts(_tds(TEXTS, ray_session), AnalyzerConfig(mode="simple"),
                           probes, depth=6, width=1 << 16)
    true, _ = _cm_brute(TEXTS, probes, 6, 1 << 16)
    # at width >> vocab², some row is collision-free w.h.p. for this
    # fixed corpus — deterministic here, so assert exact equality
    assert dict(zip(out.term, out.est.astype(int))) == {t: true.get(t, 0) for t in probes}
