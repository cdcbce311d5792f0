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
