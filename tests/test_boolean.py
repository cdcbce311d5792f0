"""Boolean (must/should/must_not) search vs a brute-force oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader, boolean_search

from oracle import OracleIndex

BOOL_CASES = [
    # (must, should, must_not)
    ("payment transfer", "", ""),
    ("payment", "invoice amount", ""),
    ("the", "", "payment"),
    ("tok00042", "payment the", "zzz"),
    ("payment transfer", "status", "иванов"),
    ("zzzznotaterm payment", "", ""),          # dead must term → empty
    ("", "payment invoice", "transfer"),        # no must → should is OR
    ("и", "", "и"),                             # must and not collide → empty
]


@pytest.fixture(scope="module")
def bool_oracle(corpus_dir):
    import pyarrow.dataset as pads

    idx = OracleIndex(AnalyzerConfig(mode="simple"))
    tbl = pads.dataset(corpus_dir).to_table(columns=["conv_id", "turn_idx", "text"]).to_pandas()
    tbl = tbl.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for i, text in enumerate(tbl["text"]):
        idx.add(i, text)
    return idx


def _brute(oracle: OracleIndex, must: str, should: str, excl: str, k: int):
    an = oracle.analyzer
    mt = sorted(set(an(must)))
    st = sorted(set(an(should)) - set(mt))
    nt = sorted(set(an(excl)))
    def docs_of(t):
        return set(oracle.postings.get(t, {}))
    if mt:
        cand = set(oracle.dl)
        for t in mt:
            cand &= docs_of(t)
    else:
        cand = set()
        for t in st:
            cand |= docs_of(t)
    for t in nt:
        cand -= docs_of(t)
    scores = {d: 0.0 for d in cand}
    full = oracle.score(" ".join(mt + st))
    for d in cand:
        scores[d] = full.get(d, 0.0)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("must,should,excl", BOOL_CASES)
def test_boolean_matches_brute(built_index, bool_oracle, must, should, excl):
    index_dir, cfg, _ = built_index
    reader = IndexReader(index_dir)
    docs, scores = reader.search_one_boolean(must, should, excl, top_k=20)
    expect = _brute(bool_oracle, must, should, excl, 20)
    assert list(docs) == [d for d, _ in expect]
    np.testing.assert_allclose(scores, [s for _, s in expect], rtol=1e-12)


def test_boolean_search_dataset(built_index):
    index_dir, cfg, _ = built_index
    qs = rd.from_pandas(
        pd.DataFrame(
            {
                "query_id": ["b1", "b2"],
                "must": ["payment", "zzzznotaterm"],
                "should": ["transfer", ""],
                "must_not": ["иванов", ""],
                "top_k": [5, 5],
            }
        )
    )
    out = boolean_search(qs, index_dir).to_pandas()
    assert set(out.columns) == {"query_id", "rank", "doc_id", "score"}
    assert (out["query_id"] == "b1").all() and len(out) <= 5  # b2 is empty
    assert (out.sort_values("rank")["score"].diff().dropna() <= 1e-12).all()


def test_min_should_match_filters_candidates(built_index):
    """msm=N keeps only docs matching ≥ N distinct should terms; msm
    larger than the live should set returns empty."""
    index_dir, cfg, _ = built_index
    r = IndexReader(index_dir)
    d1, s1 = r.search_one_boolean("", should_text="payment transfer", top_k=50)
    d2, s2 = r.search_one_boolean("", should_text="payment transfer", top_k=50,
                                  min_should_match=2)
    # msm=2 results must be a subset of msm=1, each containing BOTH terms
    assert set(d2.tolist()) <= set(d1.tolist())
    oracle_both = r.search_one_boolean("payment transfer", top_k=50)[0]  # must-AND
    assert sorted(d2.tolist()) == sorted(oracle_both.tolist())
    d3, _ = r.search_one_boolean("", should_text="payment zzznothing", top_k=50,
                                 min_should_match=2)
    assert d3.size == 0
