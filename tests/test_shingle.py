"""shingle analyzer mode: word 2-/3-shingle field (reference
shingle_analyzer — elasticsearch_component_template.json:20-29,47-52:
min_shingle_size 2, max_shingle_size 3, output_unigrams true)."""

import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.functions.analyzer import tokenize_shingle
from hybrid_sanctions_search_engine_ray.stages.analyze import _shingle_flat


def test_tokenize_shingle_basic():
    assert tokenize_shingle("wire transfer fee") == [
        "wire", "transfer", "fee",
        "wire transfer", "transfer fee",
        "wire transfer fee",
    ]
    assert tokenize_shingle("solo") == ["solo"]
    assert tokenize_shingle("") == []
    # two tokens: unigrams + one 2-shingle, no 3-shingle
    assert tokenize_shingle("a b") == ["a", "b", "a b"]


def test_tokenize_shingle_normalizes_like_simple():
    # punctuation splits, case folds — shingles form over the FILTERED
    # token sequence (punctuation gaps don't block adjacency, matching
    # the oracle's list_filter-then-slice SQL)
    assert tokenize_shingle("Wire, transfer!") == ["wire", "transfer", "wire transfer"]


@pytest.mark.parametrize(
    "text",
    [
        "Spark join filter pipeline!",
        "a b",
        "x",
        "",
        "café déjà-vu résumé naïve",  # combining marks / NFC
        "один два три четыре пять",
        "dup dup dup",
    ],
)
def test_shingle_arrow_matches_python(text):
    """The vectorized Arrow index path and the Python query-side
    tokenizer must emit the same multiset of terms per document."""
    parent, terms = _shingle_flat(pa.array([text]))
    assert sorted(terms.to_pylist()) == sorted(tokenize_shingle(text))
    assert all(p == 0 for p in parent.tolist())


def test_shingle_flat_parent_nondecreasing():
    texts = ["alpha beta gamma", "", "delta epsilon", "zeta"]
    parent, terms = _shingle_flat(pa.array(texts))
    p = parent.tolist()
    assert p == sorted(p), "flat_terms nondecreasing-parent invariant"
    # doc 1 is empty → absent; docs 0,2,3 present
    assert set(p) == {0, 2, 3}


def test_shingle_index_proximity_ranking(ray_session, tmp_path):
    """Adjacent-word documents outrank scattered-word documents for a
    multi-word query — the recall/precision property the reference's
    shingle_analyzer subfield exists for."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
    from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader

    texts = [
        "wire transfer fee schedule",            # adjacent phrase
        "wire the money transfer came later",    # scattered words
        "transfer of wire services",             # scattered, reordered
        "unrelated content entirely here",
    ]
    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
        for i, t in enumerate(texts)
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    idx = str(tmp_path / "shidx")
    cfg = EngineConfig(num_partitions=4, analyzer=AnalyzerConfig(mode="shingle"))
    m = build_index("mem", idx, cfg, transcripts_ds=ds)
    assert m.analyzer_mode == "shingle"
    r = IndexReader(idx)
    docs, scores = r.search_one("wire transfer", 4)
    assert docs.size >= 3
    assert int(docs[0]) == 0, "the adjacent-phrase doc must rank first"
    # scattered docs still retrieved (unigram recall)
    assert {1, 2} <= set(int(d) for d in docs.tolist())
