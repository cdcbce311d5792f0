"""Bigram-LM fluency scoring vs a brute-force Python twin."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from hybrid_sanctions_search_engine_ray.functions.analyzer import tokenize_simple
from hybrid_sanctions_search_engine_ray.stages.lm_score import lm_score

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox",
    "quick quick quick",
    "singleton",                    # 1 token → no bigrams → absent
    "",                             # empty → absent
    "the dog jumps over the fox and the dog sleeps",
    "совершенно другой язык и другие слова",
]
K = 0.5


def _brute(texts):
    toks = [tokenize_simple(t) for t in texts]
    cu = Counter(w for ts in toks for w in ts)
    v = len(cu)
    big = Counter()
    for ts in toks:
        big.update(zip(ts, ts[1:]))
    out = {}
    for i, ts in enumerate(toks):
        if len(ts) < 2:
            continue
        lp = [
            math.log((big[(a, b)] + K) / (cu[a] + K * v))
            for a, b in zip(ts, ts[1:])
        ]
        out[i] = (-sum(lp) / len(lp), len(lp))
    return out


def test_lm_score_matches_brute():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(TEXTS), dtype=np.int64)),
                "text": pa.array(TEXTS, pa.string()),
            }
        )
    )
    got = lm_score(ds, k=K).to_pandas().set_index("doc_id")
    expect = _brute(TEXTS)
    assert set(got.index) == set(expect)
    for d, (nll, n) in expect.items():
        assert got.loc[d, "n_bigrams"] == n
        assert abs(got.loc[d, "nll"] - round(nll, 4)) <= 1e-4, d


def test_lm_score_repeated_text_scores_lower():
    """A doc made of the corpus's most common bigram must be more fluent
    (lower nll) than a doc of unique bigrams."""
    texts = ["common pair " * 20, "unique aaa bbb ccc ddd eee fff"] + ["common pair"] * 10
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = lm_score(ds, k=K).to_pandas().set_index("doc_id")
    assert got.loc[0, "nll"] < got.loc[1, "nll"]


def test_ccnet_buckets_rules():
    """Per-lang discrete-quantile cuts: bucket sizes honor the ceil
    thresholds, ties share a bucket, ordering by nll is monotone."""
    from hybrid_sanctions_search_engine_ray.stages.lm_score import ccnet_buckets

    rng = np.random.default_rng(11)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    rows = []
    for i in range(90):
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, 10)),
                     "lang": ["xx", "yy"][i % 2]})
    df = pd.DataFrame(rows)
    docs = rd.from_pandas(df[["doc_id", "text"]]).repartition(4)
    langs = rd.from_pandas(df[["doc_id", "lang"]]).repartition(3)
    out = ccnet_buckets(docs, langs, num_partitions=4).to_pandas()
    assert len(out) == 90
    for lang, g in out.groupby("lang"):
        n = len(g)
        # threshold semantics: head count >= ceil(n/3) (ties may push it
        # over), and every head nll <= every middle nll <= every tail nll
        heads = g[g.bucket == "head"]
        mids = g[g.bucket == "middle"]
        tails = g[g.bucket == "tail"]
        assert len(heads) >= -(-n // 3)
        if len(mids):
            assert heads.nll.max() <= mids.nll.min()
        if len(tails):
            assert (mids.nll.max() if len(mids) else heads.nll.max()) <= tails.nll.min()
        # equal nll (ties) never straddle buckets
        merged = g.groupby("nll")["bucket"].nunique()
        assert (merged == 1).all()


def test_ccnet_buckets_all_ties_one_bucket():
    """Identical docs → identical nll → everything lands in head."""
    from hybrid_sanctions_search_engine_ray.stages.lm_score import ccnet_buckets

    df = pd.DataFrame({"doc_id": np.arange(9, dtype=np.int64),
                       "text": ["same text here"] * 9,
                       "lang": ["xx"] * 9})
    out = ccnet_buckets(rd.from_pandas(df[["doc_id", "text"]]),
                        rd.from_pandas(df[["doc_id", "lang"]]),
                        num_partitions=2).to_pandas()
    assert (out.bucket == "head").all()
