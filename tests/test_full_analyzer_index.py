"""End-to-end rank-identity with the FULL analyzer chain (NFKC,
transliteration, homoglyphs, initials, dates, stop words) — proves the
analyzer mode is plumbed through manifest → scorer and stays
oracle-consistent, not just the SQL-parity simple mode."""

import numpy as np
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader
from oracle import OracleIndex

FULL_CFG = EngineConfig(
    num_partitions=6,
    block_size=16,
    hot_term_df_ratio=0.2,
    hot_term_salt_shift=6,
    analyzer=AnalyzerConfig(mode="full", remove_stopwords=True),
)

QUERIES = [
    "Иванов Иван Петрович",
    "пётр ёжик",            # ё-fold must match indexed form
    "STRASSE groß",          # ß→ss + casefold
    "И.И. Сидоров",          # initials
    "payment transfer от",   # stopwords dropped on both sides
    "tok00042",
    "01.01.1980",            # date-only → empty query
]


@pytest.fixture(scope="module")
def full_index(tmp_path_factory, corpus_dir, ray_session):
    idx = str(tmp_path_factory.mktemp("fullidx") / "idx")
    manifest = build_index(corpus_dir, idx, FULL_CFG)
    return idx, manifest


@pytest.fixture(scope="module")
def full_oracle(corpus_dir):
    import pyarrow.dataset as pads

    o = OracleIndex(FULL_CFG.analyzer)
    tbl = pads.dataset(corpus_dir).to_table(columns=["conv_id", "turn_idx", "text"]).to_pandas()
    tbl = tbl.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for i, text in enumerate(tbl["text"]):
        o.add(i, text)
    return o


def test_manifest_records_full_mode(full_index):
    idx, manifest = full_index
    assert manifest.analyzer_mode == "full"
    assert manifest.remove_stopwords is True
    assert manifest.n_docs > 0


def test_full_mode_rank_identity(full_index, full_oracle):
    idx, _ = full_index
    reader = IndexReader(idx)
    assert reader.cfg.analyzer.mode == "full"
    for q in QUERIES:
        for k in (5, 25):
            docs, scores = reader.search_one(q, k)
            expected = full_oracle.topk(q, k)
            assert docs.astype(np.int64).tolist() == [d for d, _ in expected], q
            assert np.allclose(scores, [s for _, s in expected], atol=1e-6), q


def test_stopword_only_query_empty(full_index):
    idx, _ = full_index
    reader = IndexReader(idx)
    docs, _ = reader.search_one("payment от и в the", 10)
    assert docs.size == 0  # all stopwords removed → no terms → no hits
