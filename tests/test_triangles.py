"""Triangle counting (stages/graph.py) vs brute force over the
word-adjacency graph, including a hub vertex (orientation path)."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd

from hybrid_sanctions_search_engine_ray.stages.graph import triangle_stats


def _brute(texts):
    edges = set()
    for s in texts:
        toks = [t for t in s.lower().split() if t]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    nodes = {u for e in edges for u in e}
    deg = {u: 0 for u in nodes}
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = 0
    for a, b, c in combinations(sorted(nodes), 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            tri += 1
    return len(nodes), len(edges), wedges, tri


def _ds(texts, ray_session, blocks=3):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(blocks)


def test_triangles_bruteforce(ray_session):
    texts = [
        "a b c a",          # a-b, b-c, c-a → triangle
        "c d e c",          # c-d, d-e, e-c → triangle
        "a hub b hub c hub d hub e hub f",  # hub adjacent to everything
        "x y", "y z", "z x",                # triangle across docs
        "p q r s",
    ]
    out = triangle_stats(_ds(texts, ray_session)).iloc[0]
    n, e, w, t = _brute(texts)
    assert (int(out.n_nodes), int(out.n_edges), int(out.n_wedges),
            int(out.n_triangles)) == (n, e, w, t)
    assert out.clustering == np.floor(3.0 * t / w * 1e4 + 0.5) / 1e4


def test_triangles_none(ray_session):
    out = triangle_stats(_ds(["a b", "c d", "e f"], ray_session)).iloc[0]
    assert int(out.n_triangles) == 0 and out.clustering == 0.0
    assert int(out.n_edges) == 3 and int(out.n_nodes) == 6


def test_triangles_partition_invariance(ray_session):
    texts = ["a b c a b c", "b c d b", "d a c"] * 4
    a = triangle_stats(_ds(texts, ray_session, blocks=1))
    b = triangle_stats(_ds(texts, ray_session, blocks=7))
    pd.testing.assert_frame_equal(a, b)
