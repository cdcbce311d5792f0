"""Product-quantization ANN (stages/similarity.py PQ family):
codebook determinism, encode/ADC consistency, build+query recall on a
clustered corpus, persisted-layout idempotence."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hybrid_sanctions_search_engine_ray.stages.similarity import (
    PQCodebook,
    _normalize,
    pq_build,
    pq_query,
)


def _clustered(n=400, dim=16, n_clusters=8, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4
    X = centers[np.arange(n) % n_clusters] + rng.randn(n, dim) * 0.3
    return X.astype(np.float32)


def _write(tmpdir, X):
    path = os.path.join(tmpdir, "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(X)), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float32())),
    }), path)
    return path


def test_codebook_deterministic_and_consistent():
    X = _normalize(_clustered().astype(np.float64))
    a = PQCodebook(m=8, n_codes=16).fit(X)
    b = PQCodebook(m=8, n_codes=16).fit(X)
    np.testing.assert_array_equal(a.codebooks, b.codebooks)
    codes = a.encode(X)
    assert codes.shape == (len(X), 8) and codes.dtype == np.uint8
    # ADC of a vector against ITS OWN code equals the true sub-distance sum
    q = X[5]
    t = a.adc_table(q)
    adc = t[np.arange(8), codes[5]].sum()
    recon = np.concatenate([a.codebooks[j, codes[5, j]] for j in range(8)])
    assert adc == pytest.approx(((q - recon) ** 2).sum())


def test_codebook_rejects_bad_m():
    with pytest.raises(ValueError):
        PQCodebook(m=5).fit(np.zeros((10, 16)))


def test_pq_build_query_recall(ray_session, tmp_path):
    X = _clustered()
    path = _write(str(tmp_path), X)
    out = os.path.join(str(tmp_path), "pq")
    pq_build(path, out, m=16, n_codes=16)
    # brute-force truth (cosine, exclude self)
    Xn = _normalize(X.astype(np.float64))
    qids = [3, 77, 200]
    sims = Xn[qids] @ Xn.T
    got = pq_query(out, path, qids, X[qids], k=5, rerank=80)
    rec = []
    for i, qid in enumerate(qids):
        s = sims[i].copy()
        s[qid] = -np.inf
        truth = set(np.argsort(-s, kind="stable")[:5].tolist())
        mine = set(got[got.query_vec_id == qid]["vec_id"].astype(int))
        rec.append(len(truth & mine) / 5)
    assert np.mean(rec) >= 0.9
    # ranks are 1..5 and scores descending per query
    for qid, g in got.groupby("query_vec_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert list(g.cos_sim) == sorted(g.cos_sim, reverse=True)


def test_pq_build_idempotent(ray_session, tmp_path):
    X = _clustered(n=100)
    path = _write(str(tmp_path), X)
    out = os.path.join(str(tmp_path), "pq")
    pq_build(path, out, m=8, n_codes=8)
    books1 = np.load(os.path.join(out, "codebooks.npy"))
    mtime = os.path.getmtime(os.path.join(out, "codebooks.npy"))
    pq_build(path, out, m=8, n_codes=8)          # meta matches → no rebuild
    assert os.path.getmtime(os.path.join(out, "codebooks.npy")) == mtime
    pq_build(path, out, m=8, n_codes=16)         # meta differs → rebuild
    books2 = np.load(os.path.join(out, "codebooks.npy"))
    assert books2.shape[1] == 16 and books1.shape[1] == 8


def test_pq_query_exact_bruteforce_parity(ray_session, tmp_path):
    """pq_query_exact (the value-gated ann_pq serving path) must equal a
    local integer replay: encode by integer argmin against the persisted
    quantized codebook, ADC lookup-sum, top-rerank by (adc, vec_id),
    integer-dot rescore by (dot desc, vec_id) — self excluded."""
    from hybrid_sanctions_search_engine_ray.stages.similarity import (
        _quantize_norm_int, pq_query_exact)

    X = _clustered(n=80, dim=16)
    path = _write(str(tmp_path), X)
    out = os.path.join(str(tmp_path), "pqx")
    m, nc, k, rerank = 4, 8, 3, 20
    pq_build(path, out, m=m, n_codes=nc)
    got = pq_query_exact(out, path, n_queries=2, k=k, rerank=rerank)

    # replay from the persisted codebook parquet
    cb = pq.read_table(os.path.join(out, "codebook.parquet"))
    sub = 16 // m
    books_q = np.zeros((m, nc, sub), dtype=np.int64)
    books_q[cb["sub"].to_numpy(), cb["code"].to_numpy(),
            cb["d"].to_numpy() % sub] = cb["val_q"].to_numpy()
    Nq = _quantize_norm_int(X.astype(np.float64))
    N_s = Nq.reshape(len(X), m, sub)
    d2 = ((N_s[:, :, None, :] - books_q[None]) ** 2).sum(axis=3)
    codes = d2.argmin(axis=2)
    ids = np.arange(len(X), dtype=np.int64)
    for qid in (0, 1):
        T = ((Nq[qid].reshape(m, sub)[:, None, :]
              - books_q.transpose(0, 1, 2)[np.arange(m)][:, :, :]) ** 2
             ).sum(axis=2)
        sc = T[np.arange(m)[None, :], codes].sum(axis=1)
        mask = ids != qid
        order = np.lexsort((ids[mask], sc[mask]))[:rerank]
        cid, cadc = ids[mask][order], sc[mask][order]
        dots = Nq[cid] @ Nq[qid]
        fin = np.lexsort((cid, -dots))[:k]
        g = got[got.query_vec_id == qid]
        assert list(g["vec_id"]) == cid[fin].tolist()
        assert list(g["adc_d2"]) == cadc[fin].tolist()
        assert list(g["dot_q"]) == dots[fin].tolist()
        assert list(g["rank"]) == [1, 2, 3]


def test_pq_adc_exact_bruteforce_parity(ray_session, tmp_path):
    """pq_adc_exact must equal a local integer brute-force replay:
    same Lehmer anchor ranking, same ×scale quantization, same
    (score, vec_id) tie-break, self excluded."""
    from hybrid_sanctions_search_engine_ray.stages.similarity import pq_adc_exact
    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away

    X = _clustered(n=60, dim=16)
    path = _write(str(tmp_path), X)
    m, nc, k, scale = 4, 8, 3, 1_000_000
    got = pq_adc_exact(path, n_queries=2, m=m, n_codes=nc, k=k, scale=scale)

    # brute-force replay
    P = 2147483647
    ids = np.arange(len(X), dtype=np.int64)
    key = ((ids % P) * 48271) % P
    anchors = ids[np.lexsort((ids, key))[:nc]]
    Q = round_half_away(X.astype(np.float64) * scale, 0).astype(np.int64)
    A = Q[anchors]
    sub = 16 // m
    A_s = A.reshape(nc, m, sub)
    X_s = Q.reshape(len(X), m, sub)
    d2 = ((X_s[:, :, None, :] - A_s.transpose(1, 0, 2)[None]) ** 2).sum(axis=3)
    codes = d2.argmin(axis=2)
    for qid in (0, 1):
        T = ((Q[qid].reshape(m, sub)[:, None, :] - A_s.transpose(1, 0, 2)) ** 2).sum(axis=2)
        sc = T[np.arange(m)[None, :], codes].sum(axis=1)
        mask = ids != qid
        order = np.lexsort((ids[mask], sc[mask]))[:k]
        want_ids = ids[mask][order]
        want_sc = sc[mask][order]
        g = got[got.query_vec_id == qid]
        assert list(g["vec_id"]) == want_ids.tolist()
        assert list(g["adc_d2"]) == want_sc.tolist()
        assert list(g["rank"]) == [1, 2, 3]


def test_ivf_probe_exact_bruteforce_parity(ray_session, tmp_path):
    """ivf_probe_exact must equal a local integer replay: same
    quantize-normalize kernel, assignment/probe ties → lowest cluster,
    candidates restricted to probed clusters, top-k by (dot desc,
    vec_id), self excluded — and the persisted centroid table must
    reproduce the assignment."""
    from hybrid_sanctions_search_engine_ray.stages.similarity import (
        _quantize_norm_int,
        ivf_probe_exact,
    )

    X = _clustered(n=80, dim=16)
    path = _write(str(tmp_path), X)
    odir = os.path.join(str(tmp_path), "ivf_oracle")
    nc, nprobe, k = 4, 2, 3
    got = ivf_probe_exact(path, odir, n_queries=2, n_clusters=nc,
                          nprobe=nprobe, k=k, sample_rows=32, n_iter=4)

    cent = pq.read_table(os.path.join(odir, "centroids.parquet")).to_pandas()
    qc = (cent.sort_values(["cluster", "d"])["val_q"].to_numpy()
          .reshape(nc, 16).astype(np.int64))
    nq = _quantize_norm_int(X.astype(np.float64))
    ids = np.arange(len(X), dtype=np.int64)
    d2 = ((nq[:, None, :] - qc[None, :, :]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1)
    for qid in (0, 1):
        probed = np.lexsort((np.arange(nc), d2[qid]))[:nprobe]
        mask = np.isin(cl, probed) & (ids != qid)
        dots = nq[mask] @ nq[qid]
        order = np.lexsort((ids[mask], -dots))[:k]
        g = got[got.query_vec_id == qid]
        assert list(g["vec_id"]) == ids[mask][order].tolist()
        assert list(g["dot_q"]) == dots[order].tolist()
        assert list(g["cluster"]) == cl[mask][order].tolist()
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_ivf_probe_exact_deterministic_across_runs(ray_session, tmp_path):
    """Two runs (fresh oracle dirs) must be identical — training is
    deterministic in the sample hash order, so the persisted centroid
    table and the full result frame reproduce bit-for-bit."""
    from hybrid_sanctions_search_engine_ray.stages.similarity import ivf_probe_exact

    X = _clustered(n=60, dim=16, seed=11)
    path = _write(str(tmp_path), X)
    a = ivf_probe_exact(path, os.path.join(str(tmp_path), "o1"), n_queries=2,
                        n_clusters=4, nprobe=2, k=3, sample_rows=32)
    b = ivf_probe_exact(path, os.path.join(str(tmp_path), "o2"), n_queries=2,
                        n_clusters=4, nprobe=2, k=3, sample_rows=32)
    pd.testing.assert_frame_equal(a, b)
