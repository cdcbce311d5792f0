import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.embeddings import (
    HashingEmbedder,
    embed_documents,
    write_embeddings,
)


def _docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


TEXTS = [
    "spark join filter spark join",
    "spark join filter",
    "completely different words entirely here",
    "",
]


def test_embedder_deterministic_and_unit_norm():
    e = HashingEmbedder(dim=32)
    out1 = e(_docs_table(TEXTS))
    out2 = HashingEmbedder(dim=32)(_docs_table(TEXTS))
    m1 = np.array(out1["embedding"].to_pylist())
    m2 = np.array(out2["embedding"].to_pylist())
    assert np.array_equal(m1, m2)
    norms = np.linalg.norm(m1, axis=1)
    assert np.allclose(norms[:3], 1.0, atol=1e-5)
    assert norms[3] == 0.0  # empty doc → zero vector


def test_embedder_batching_invariant():
    e = HashingEmbedder(dim=32)
    whole = np.array(e(_docs_table(TEXTS))["embedding"].to_pylist())
    parts = [
        np.array(e(_docs_table(TEXTS[:2]))["embedding"].to_pylist()),
        np.array(e(_docs_table(TEXTS[2:]))["embedding"].to_pylist()),
    ]
    assert np.allclose(whole, np.vstack(parts))


def test_embedder_semantic_property():
    """Token-overlapping docs must be far closer than disjoint ones."""
    e = HashingEmbedder(dim=64)
    m = np.array(e(_docs_table(TEXTS))["embedding"].to_pylist())
    sim_close = float(m[0] @ m[1])
    sim_far = float(m[0] @ m[2])
    assert sim_close > 0.8
    assert sim_close > sim_far + 0.3


def test_embed_documents_pipeline_and_sink(ray_session, tmp_path):
    """Actor-pool embed → parquet sink → similarity search consumes it."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.similarity import brute_force_topk

    texts = [f"tok{i % 7} tok{i % 5} tok{i % 3} filler{i}" for i in range(60)]
    ds = rd.from_arrow(_docs_table(texts))
    out = str(tmp_path / "emb.parquet")
    write_embeddings(ds, out, dim=32, concurrency=2)
    tbl = pq.read_table(out)
    assert tbl.num_rows == 60
    assert set(tbl.column_names) == {"doc_id", "embedding"}

    emb_ds = rd.read_parquet(out).map_batches(
        lambda b: b.rename_columns(["vec_id", "embedding"]), batch_format="pyarrow"
    )
    q = np.array(tbl["embedding"].to_pylist()[:2], dtype=np.float64)
    res = brute_force_topk(emb_ds, [0, 1], q, k=3, exclude_self=False).to_pandas()
    for qid in (0, 1):
        top = res[res.query_vec_id == qid].sort_values("rank").iloc[0]
        assert top["vec_id"] == qid  # self is most similar
        assert top["cos_sim"] == pytest.approx(1.0, abs=1e-5)


def test_vectors_jsonl_roundtrip_exact(ray_session, tmp_path):
    """JSONL vector sink/source: sharded write, value-exact float32
    roundtrip (reference S4 vector JSON export re-expressed)."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.embeddings import (
        read_vectors_json,
        write_vectors_json,
    )

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(40, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        )
    )
    out = str(tmp_path / "vecs_jsonl")
    write_vectors_json(ds, out)
    back = read_vectors_json(out).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert back["vec_id"].tolist() == list(range(40))
    got = np.array(back["embedding"].tolist(), dtype=np.float32)
    np.testing.assert_array_equal(got, vecs)  # bit-exact through JSON


def test_rag_retrieve_end_to_end(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.embeddings import rag_retrieve

    # doc 0 is about alpha topics, doc 1 about omega topics; long enough
    # to produce multiple chunks with window 4 / stride 2
    texts = ["alpha beta alpha gamma alpha beta gamma alpha",
             "omega psi omega chi omega psi chi omega"]
    rows = [{"doc_id": i, "text": t, "conv_id": f"c{i}", "turn_idx": 0,
             "role": "user", "tool": "", "ts": pd.Timestamp(2026, 1, 1)}
            for i, t in enumerate(texts)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = rag_retrieve(ds, {"qa": "alpha beta", "qo": "omega psi"},
                       dim=32, window=4, stride=2, k=3)
    assert set(out["query_id"]) == {"qa", "qo"}
    # the alpha query's best chunks come from doc 0, omega's from doc 1
    assert (out.loc[out.query_id == "qa"].iloc[0]["doc_id"]) == 0
    assert (out.loc[out.query_id == "qo"].iloc[0]["doc_id"]) == 1
    assert (out.groupby("query_id")["rank"].apply(lambda r: r.tolist() == [1, 2, 3])).all()
    # chunk ids decompose to real chunk indexes
    assert (out["chunk_idx"] >= 0).all() and (out["chunk_idx"] < 10).all()


# --- pluggable backend (reference embedding_service.py:108-150 seam) ---------


def _make_fake_backend():
    """Build a stand-in 'model factory': the returned factory is a NESTED
    function with no module-global references, so cloudpickle ships it BY
    VALUE into Ray actors (a module-level function here would pickle by
    reference to the tests module, which workers cannot import). The
    encoder's vectors are a pure function of text length and first byte —
    cheap, but shaped exactly like a neural encode(texts) -> (n, dim)."""

    def factory():
        import numpy as _np

        def encode(texts):
            out = _np.zeros((len(texts), 8), dtype=_np.float32)
            for i, t in enumerate(texts):
                out[i, 0] = len(t)
                out[i, 1] = (ord(t[0]) % 97) if t else 0.0
                out[i, 2] = t.count(" ") + 1.0
                out[i, 3] = 1.0
            return out

        return encode

    return factory


def test_backend_swap_matches_local_model(ray_session):
    import numpy as np
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.embeddings import embed_documents

    texts = ["alpha beta", "x", "some longer text here", ""]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    got = embed_documents(ds, dim=8, backend_factory=_make_fake_backend(),
                          concurrency=2, batch_size=2).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    # driver-side ground truth: same encoder, then L2 norm
    raw = _make_fake_backend()()(texts).astype(np.float64)
    norms = np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12)
    want = (raw / norms).astype(np.float32)
    mat = np.stack(got["embedding"].to_numpy())
    assert mat.shape == (4, 8)
    assert np.allclose(mat, want, atol=1e-6)


def test_backend_dim_mismatch_raises():
    # direct class call (no Ray): a raising UDF inside an actor pool
    # would be retried by the pool machinery — the contract is the
    # Embedder's own validation, test it at the source
    import pyarrow as pa
    import pytest as _pytest

    from hybrid_sanctions_search_engine_ray.stages.embeddings import Embedder

    emb = Embedder(dim=16, backend_factory=_make_fake_backend())
    with _pytest.raises(ValueError, match="expected"):
        emb(pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["x"], pa.string())}))


def test_backend_default_is_hashing(ray_session):
    """No factory → byte-identical to the HashingEmbedder path (backend
    seam must not perturb the deterministic default)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.embeddings import (
        HashingEmbedder,
        embed_documents,
    )

    texts = ["alpha beta gamma", "beta beta", "unrelated words here"]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    got = embed_documents(ds, dim=16, concurrency=2).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    ref = HashingEmbedder(dim=16)(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    want = np.stack(ref["embedding"].to_pandas().to_numpy())
    assert np.array_equal(np.stack(got["embedding"].to_numpy()), want)


def test_backend_vectors_flow_into_similarity_tier(ray_session):
    """Backend vectors are first-class citizens of the vector tier:
    brute-force cosine top-k over them equals a driver-side numpy
    ground truth (the 'recall vs brute force' harness wired to the
    pluggable backend — swap in a real model where weights exist)."""
    import numpy as np
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.embeddings import embed_documents
    from hybrid_sanctions_search_engine_ray.stages.similarity import brute_force_topk

    texts = [f"doc {'x ' * (i % 7)}number {i}" for i in range(40)]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    emb = embed_documents(ds, dim=8, backend_factory=_make_fake_backend(),
                          concurrency=2).map_batches(
        lambda b: b.rename_columns(["vec_id", "embedding"]), batch_format="pyarrow"
    )
    raw = _make_fake_backend()()(texts).astype(np.float64)
    mat = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12)
    q = mat[:2].astype(np.float32).astype(np.float64)
    res = brute_force_topk(emb, [100, 101], q, k=5, exclude_self=False).to_pandas()
    f32 = mat.astype(np.float32).astype(np.float64)
    sims = f32 @ q.astype(np.float32).astype(np.float64).T
    for qi, qid in enumerate((100, 101)):
        order = np.lexsort((np.arange(40), -np.round(sims[:, qi], 12)))[:5]
        got = res[res["query_vec_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert got == order.tolist()
