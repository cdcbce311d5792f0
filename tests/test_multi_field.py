"""Multi-field builds (pipelines/index_build.build_multi_field): one
corpus ingest feeding word + shingle + char3 field indexes — the ES
multi-subfield layout — with identical doc ids across fields."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.functions.fusion import rrf_fusion
from hybrid_sanctions_search_engine_ray.pipelines.index_build import (
    build_index,
    build_multi_field,
)
from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader


def _corpus_ds():
    import ray.data as rd

    texts = [
        "wire transfer fee schedule for accounts",
        "the money transfer came later by wire",
        "transfer of wire services order",
        "unrelated content entirely here today",
        "spark join filter pipeline streaming",
        "customer order table scan merge",
    ]
    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1)}
        for i, t in enumerate(texts)
    ]
    return rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))


def test_multi_field_build_ids_identical_and_checkpoint_reused(ray_session, tmp_path):
    base = str(tmp_path / "mf")
    cfg = EngineConfig(num_partitions=4)
    ms = build_multi_field("mem", base, cfg, modes=("simple", "shingle", "char3"),
                           transcripts_ds=_corpus_ds())
    assert set(ms) == {"simple", "shingle", "char3"}
    assert all(m.status == "complete" and m.n_docs == 6 for m in ms.values())
    assert ms["simple"].analyzer_mode == "simple"
    assert ms["shingle"].analyzer_mode == "shingle"
    # doc ids identical across fields: every docmap maps doc_id→conv_id the same way
    maps = {}
    for mode in ms:
        dm = os.path.join(base, f"field={mode}", "docmap.parquet")
        files = sorted(os.path.join(dm, f) for f in os.listdir(dm) if f.endswith(".parquet"))
        t = pq.read_table(files, columns=["doc_id", "conv_id"])
        maps[mode] = sorted(zip(t["doc_id"].to_pylist(), t["conv_id"].to_pylist()))
    assert maps["simple"] == maps["shingle"] == maps["char3"]
    # the first field's checkpoint still holds text (it IS the shared source)
    first_files = sorted(
        f for f in os.listdir(os.path.join(base, "field=simple", "docmap.parquet"))
        if f.endswith(".parquet")
    )
    schema = pq.read_schema(os.path.join(base, "field=simple", "docmap.parquet", first_files[0]))
    assert "text" in schema.names


def test_multi_field_equals_independent_builds(ray_session, tmp_path):
    """A field built through the shared checkpoint must be
    query-identical to the same field built independently."""
    base = str(tmp_path / "mf2")
    cfg = EngineConfig(num_partitions=4)
    build_multi_field("mem", base, cfg, modes=("simple", "shingle"), transcripts_ds=_corpus_ds())
    solo = str(tmp_path / "solo_shingle")
    build_index("mem", solo, EngineConfig(num_partitions=4, analyzer=AnalyzerConfig(mode="shingle")),
                transcripts_ds=_corpus_ds())
    r_mf = IndexReader(os.path.join(base, "field=shingle"))
    r_solo = IndexReader(solo)
    for q in ["wire transfer", "customer order table", "spark join"]:
        d1, s1 = r_mf.search_one(q, 6)
        d2, s2 = r_solo.search_one(q, 6)
        assert d1.tolist() == d2.tolist()
        assert s1.tolist() == s2.tolist()


def test_multi_field_rrf_fusion(ray_session, tmp_path):
    """Per-field ranked lists fuse directly because doc ids align."""
    base = str(tmp_path / "mf3")
    ms = build_multi_field("mem", base, EngineConfig(num_partitions=4),
                           modes=("simple", "shingle"), transcripts_ds=_corpus_ds())
    rw = IndexReader(os.path.join(base, "field=simple"))
    rs = IndexReader(os.path.join(base, "field=shingle"))
    dw, _ = rw.search_one("wire transfer", 6)
    dsh, _ = rs.search_one("wire transfer", 6)
    import numpy as np
    docs, scores = rrf_fusion([np.asarray(dw), np.asarray(dsh)], k=60, top_k=3)
    assert len(docs) == 3
    assert int(docs[0]) == 0  # adjacent-phrase doc wins both fields
