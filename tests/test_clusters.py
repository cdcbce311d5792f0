"""Connected-components dup clustering vs a pure-Python union-find oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.stages.clusters import (
    assign_clusters,
    connected_components,
)


def _union_find(n_edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # root = min node of component
    return {x: find(x) for x in parent}


def _cc_dict(edges: list[tuple[int, int]]) -> dict[int, int]:
    ds = rd.from_pandas(
        pd.DataFrame({"a": [e[0] for e in edges], "b": [e[1] for e in edges]}).astype(np.int64)
    )
    out = connected_components(ds).to_pandas()
    got = dict(zip(out["node"].astype(int), out["root"].astype(int)))
    # every non-root clustered node appears exactly once
    assert len(out) == len(set(out["node"]))
    return got


def _expected(edges: list[tuple[int, int]]) -> dict[int, int]:
    uf = _union_find(edges)
    return {n: r for n, r in uf.items() if n != r}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2)],
        [(1, 2), (2, 3)],                      # chain → transitive
        [(3, 2), (2, 1), (10, 11), (11, 10)],  # two components, dup/reversed edges
        [(5, 5), (1, 2)],                      # self-loop ignored
        [(i, i + 1) for i in range(30)],       # long chain (worst diameter)
        [(0, i) for i in range(1, 20)],        # star already
        [(i, j) for i in range(8) for j in range(i + 1, 8)],  # clique
    ],
)
def test_cc_matches_union_find(edges):
    assert _cc_dict(edges) == _expected(edges)


def test_cc_random_graphs():
    rng = np.random.default_rng(7)
    for trial in range(8):
        n = int(rng.integers(5, 80))
        m = int(rng.integers(1, 3 * n))
        edges = [tuple(sorted(map(int, rng.integers(0, n, 2)))) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
        assert _cc_dict(edges) == _expected(edges), f"trial {trial}: {edges}"


def test_cc_empty_edges():
    ds = rd.from_pandas(pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}))
    assert connected_components(ds).count() == 0


def test_assign_clusters_covers_singletons():
    corpus = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64)}))
    comps = connected_components(
        rd.from_pandas(pd.DataFrame({"a": [1, 2], "b": [2, 3]}).astype(np.int64))
    )
    out = assign_clusters(corpus, comps).to_pandas().sort_values("doc_id")
    expect = {i: i for i in range(10)}
    expect.update({2: 1, 3: 1})
    assert dict(zip(out["doc_id"], out["cluster_id"])) == expect
