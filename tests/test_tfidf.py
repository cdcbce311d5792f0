"""Char-3-gram TF-IDF cosine (reference CharTfidfVectorIndex semantics:
sublinear tf, smooth idf, l2 norm, fitted-idf query transform)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.stages.tfidf import (
    char3_tf,
    gram_df,
    query_weights,
    smooth_idf,
    tfidf_topk,
)

DOCS = ["spark spark join", "merge join window", "spark merge"]


def _tbl(texts=DOCS):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_char3_tf_counts_multiplicities():
    out = char3_tf(_tbl()).to_pandas()
    row = out[(out.doc_id == 0) & (out.gram == "spa")]
    assert row["tf"].iloc[0] == 2  # 'spark' twice
    assert (out[(out.doc_id == 2)]["tf"] == 1).all()
    short = char3_tf(_tbl(["ab ab x"])).to_pandas()  # len<3 → whole token
    assert set(short["gram"]) == {"ab", "x"}
    assert short[short.gram == "ab"]["tf"].iloc[0] == 2


def test_exact_score_hand_computed(ray_session):
    """Doc 'spark merge' vs query 'spark': 6 equal-weight grams, 3 shared
    → cos = sqrt(3)/sqrt(6) exactly (idf cancels — all grams df=2)."""
    import ray.data as rd

    out = tfidf_topk(rd.from_arrow(_tbl()), "spark", k=3)
    d2 = out[out.doc_id == 2]["score"].iloc[0]
    assert d2 == pytest.approx(np.sqrt(3) / np.sqrt(6), abs=1e-4)
    assert list(out["rank"]) == [1, 2]  # doc 1 has no query gram → absent


def test_query_weights_drop_unseen_and_normalize():
    idf = {"spa": 1.5, "par": 1.5, "ark": 1.5}
    qw = query_weights("sparkle", idf)  # kle/rkl unseen → dropped
    assert set(qw) == {"spa", "par", "ark"}
    assert np.isclose(np.sqrt(sum(v * v for v in qw.values())), 1.0)
    assert query_weights("zzz", idf) == {}  # fully out-of-vocab
    assert query_weights("", idf) == {}


def test_smooth_idf_formula():
    assert smooth_idf(np.array([1]), 3)[0] == pytest.approx(np.log(4 / 2) + 1)
    # df == N → idf floor of exactly 1
    assert smooth_idf(np.array([5]), 5)[0] == pytest.approx(1.0)


def test_gram_df_batching_invariant(ray_session):
    import ray.data as rd

    t = _tbl(DOCS * 20)
    t = t.set_column(0, "doc_id", pa.array(range(60), pa.int64()))
    one = gram_df(rd.from_arrow(t)).to_pandas().sort_values("gram").reset_index(drop=True)
    two = gram_df(rd.from_arrow([t.slice(0, 17), t.slice(17)])).to_pandas() \
        .sort_values("gram").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, two)


def test_topk_rank_rule_and_empty(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl())
    out = tfidf_topk(ds, "spark join", k=2)
    assert len(out) == 2 and list(out["rank"]) == [1, 2]
    assert (out["score"].to_numpy()[:-1] >= out["score"].to_numpy()[1:]).all()
    none = tfidf_topk(ds, "zzzz", k=2)
    assert none.empty and list(none.columns) == ["rank", "doc_id", "score"]
