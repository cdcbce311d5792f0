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
