import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader, attach_docmap, phrase_search

CFG = EngineConfig(num_partitions=4, analyzer=AnalyzerConfig(mode="simple"))

TEXTS = [
    "alpha beta gamma delta",          # has "beta gamma"
    "beta alpha gamma delta",          # terms present, phrase absent
    "the alpha beta gamma song",       # has "beta gamma"
    "unrelated words entirely here",
    "Beta, Gamma!",                    # analyzer folds case/punct → phrase present
]


@pytest.fixture(scope="module")
def text_index(tmp_path_factory, ray_session):
    import ray.data as rd

    rows = []
    for i, t in enumerate(TEXTS):
        rows.append(
            {
                "conv_id": f"conv-{i:08d}",
                "turn_idx": 0,
                "role": "user",
                "text": t,
                "tool": "",
                "ts": pd.Timestamp(2026, 1, 1),
            }
        )
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    idx = str(tmp_path_factory.mktemp("phrase") / "idx")
    build_index("mem", idx, CFG, transcripts_ds=ds, store_text=True)
    return idx


def test_phrase_hits_only_contiguous(text_index):
    out = phrase_search(text_index, "beta gamma", top_k=10)
    assert set(out["doc_id"]) == {0, 2, 4}


def test_phrase_respects_analyzer_folding(text_index):
    out = phrase_search(text_index, "BETA, gamma", top_k=10)
    assert 4 in set(out["doc_id"])


def test_phrase_no_match(text_index):
    out = phrase_search(text_index, "gamma beta", top_k=10)
    assert set(out["doc_id"]) == set()  # reversed order never contiguous


def test_phrase_requires_store_text(ray_session, tmp_path):
    """On the doc_id-carrying input path the docmap omits text unless
    store_text — phrase search must refuse. (The checkpoint path always
    persists text, so phrase search works there without the flag.)"""
    import ray.data as rd

    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
        for i, t in enumerate(TEXTS)
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    idx = str(tmp_path / "notext")
    build_index("mem", idx, CFG, transcripts_ds=ds)  # no store_text
    with pytest.raises(ValueError):
        phrase_search(idx, "beta gamma", top_k=5)


def test_phrase_works_on_checkpoint_path_without_flag(built_index):
    """Index built from a no-doc_id corpus (checkpoint path): text is in
    the checkpoint-docmap, so phrase search works without store_text."""
    index_dir, _, _ = built_index
    out = phrase_search(index_dir, "payment transfer", top_k=5)
    assert isinstance(out, pd.DataFrame)  # no raise; hits optional


def test_attach_docmap_carries_text(text_index):
    r = IndexReader(text_index)
    docs, scores = r.search_one("alpha", 5)
    df = pd.DataFrame({"query_id": "q", "rank": np.arange(1, docs.size + 1),
                       "doc_id": docs.astype(np.int64), "score": scores})
    joined = attach_docmap(df, text_index)
    assert "text" in joined.columns
    assert joined["text"].notna().all()
