"""Label propagation (stages/similarity.label_propagation) vs a
brute-force replay on a synthetic clustered corpus: seeds clamp,
labels spread to cluster mates, unreachable islands stay -1."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from hybrid_sanctions_search_engine_ray.stages.similarity import (
    _normalize,
    label_propagation,
)


def _corpus(tmpdir, n=120, dim=8, n_lab=3, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_lab, dim) * 6
    labels = (np.arange(n) % n_lab).astype(np.int32)
    X = (centers[labels] + rng.randn(n, dim) * 0.2).astype(np.float32)
    # an isolated far-away island with a label no seed carries
    X[-2:] = 90.0 + rng.randn(2, dim).astype(np.float32) * 0.01
    labels[-2:] = 9
    path = os.path.join(tmpdir, "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), path)
    return path, X, labels


def _brute(X, labels, k, n_iter, seed_mod):
    n = len(X)
    Xn = _normalize(X.astype(np.float64))
    sims = Xn @ Xn.T
    np.fill_diagonal(sims, -np.inf)
    nbrs = [np.lexsort((np.arange(n), -sims[i]))[:k] for i in range(n)]
    seed = np.arange(n) % seed_mod == 0
    lab = np.where(seed, labels.astype(np.int64), -1)
    for _ in range(n_iter):
        new = np.where(seed, labels.astype(np.int64), -1)
        for u in range(n):
            if seed[u]:
                continue
            votes = [int(lab[v]) for v in nbrs[u] if lab[v] >= 0]
            if votes:
                vals, cnts = np.unique(votes, return_counts=True)
                new[u] = int(vals[np.lexsort((vals, -cnts))[0]])
        lab = new
    return lab


def test_label_prop_matches_brute(ray_session, tmp_path):
    path, X, labels = _corpus(str(tmp_path))
    out = label_propagation(path, k=4, n_iter=3, seed_mod=5)
    exp = _brute(X, labels, 4, 3, 5)
    np.testing.assert_array_equal(out["label"].to_numpy(), exp)
    # seeds clamped
    seeds = out[out.vec_id % 5 == 0]
    np.testing.assert_array_equal(seeds["label"].to_numpy(),
                                  labels[::5].astype(np.int64))
    # non-seed cluster members adopted their cluster's label (high accuracy)
    ns = out[(out.vec_id % 5 != 0) & (out.vec_id < 118)]
    acc = (ns["label"].to_numpy() == labels[ns.vec_id.to_numpy()]).mean()
    assert acc > 0.8


def test_label_prop_island_unreached(ray_session, tmp_path):
    # with seed_mod chosen so the island's 2 vectors are NOT seeds and
    # only point at each other + far vectors, they can only inherit via
    # their kNN; check agreement with brute force regardless
    path, X, labels = _corpus(str(tmp_path), n=121)
    out = label_propagation(path, k=3, n_iter=2, seed_mod=7)
    exp = _brute(X, labels, 3, 2, 7)
    np.testing.assert_array_equal(out["label"].to_numpy(), exp)
