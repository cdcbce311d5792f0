import numpy as np
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.stages.similarity import (
    IVFIndex,
    _normalize,
    brute_force_topk,
    ivf_topk,
)


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((300, 16)).astype(np.float32)
    return m


def _emb_table(m):
    return pa.table(
        {
            "vec_id": pa.array(range(len(m)), pa.int64()),
            "embedding": pa.array([row for row in m.tolist()], pa.list_(pa.float32())),
        }
    )


def test_brute_force_matches_numpy(ray_session, vectors):
    import ray.data as rd

    ds = rd.from_arrow(_emb_table(vectors))
    q_ids = [0, 5]
    qm = vectors[q_ids].astype(np.float64)
    res = brute_force_topk(ds, q_ids, qm, k=7).to_pandas()

    mn = _normalize(vectors.astype(np.float64))
    for qi, qid in enumerate(q_ids):
        sims = mn @ _normalize(qm)[qi]
        sims[qid] = -np.inf  # exclude self
        expect = np.argsort(-sims, kind="stable")[:7]
        got = res[res.query_vec_id == qid].sort_values("rank")["vec_id"].to_numpy()
        assert list(got) == list(expect)


def test_ivf_recall(ray_session, vectors):
    import ray.data as rd

    ds = rd.from_arrow(_emb_table(vectors))
    q_ids = [0, 5, 9]
    qm = vectors[q_ids].astype(np.float64)
    exact = brute_force_topk(ds, q_ids, qm, k=5).to_pandas()
    approx = ivf_topk(ds, q_ids, qm, k=5, n_clusters=8, nprobe=4, sample_rows=300).to_pandas()
    hits = total = 0
    for qid in q_ids:
        e = set(exact[exact.query_vec_id == qid]["vec_id"])
        a = set(approx[approx.query_vec_id == qid]["vec_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.6, f"IVF recall too low: {hits}/{total}"


def test_ivf_deterministic(vectors):
    c1 = IVFIndex(n_clusters=8).fit(vectors).centroids
    c2 = IVFIndex(n_clusters=8).fit(vectors).centroids
    assert np.array_equal(c1, c2)
