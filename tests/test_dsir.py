"""DSIR importance resampling (stages/dsir.py) vs a brute-force replay
of the published recipe (hashed-unigram bucket counts, add-one
smoothing, log-ratio weights) and a signal-direction check."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from hybrid_sanctions_search_engine_ray.stages.dsir import dsir_select

B = 512


def _bucket(tok: str) -> int:
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little") % B


def _brute(df: pd.DataFrame, n_select: int) -> pd.DataFrame:
    ct = np.zeros(B)
    cr = np.zeros(B)
    for _, r in df.iterrows():
        tgt = ct if r.is_target else cr
        for t in r.text.lower().split():
            tgt[_bucket(t)] += 1
    lr = np.log((ct + 1) / (ct.sum() + B)) - np.log((cr + 1) / (cr.sum() + B))
    rows = []
    for _, r in df[~df.is_target].iterrows():
        w = sum(lr[_bucket(t)] for t in r.text.lower().split())
        rows.append((r.doc_id, np.sign(w) * np.floor(abs(w) * 1e4 + 0.5) / 1e4))
    out = pd.DataFrame(rows, columns=["doc_id", "logw"])
    return out.sort_values(["logw", "doc_id"], ascending=[False, True],
                           kind="mergesort").head(n_select).reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus(ray_session):
    rng = np.random.RandomState(5)
    en = ["the quick brown fox jumps", "a dog is in the house",
          "where is the cat", "good morning to you"]
    xx = ["der hund ist im haus", "el gato esta aqui",
          "le chien est la", "und die katze auch"]
    rows = []
    for i in range(120):
        pool, is_t = (en, True) if i % 3 == 0 else (xx, False)
        words = " ".join(
            " ".join(rng.choice(pool).split()[: rng.randint(2, 6)])
            for _ in range(3))
        # salt some raw docs with English words → they should rank high
        if not is_t and i % 10 == 1:
            words += " the the is a"
        rows.append({"doc_id": i, "text": words, "is_target": is_t})
    return pd.DataFrame(rows)


def test_dsir_matches_bruteforce(corpus):
    import ray.data as rd

    out = dsir_select(rd.from_pandas(corpus).repartition(5), "is_target",
                      n_select=20, n_buckets=B)
    exp = _brute(corpus, 20)
    assert list(out.doc_id) == list(exp.doc_id)
    np.testing.assert_allclose(out.logw, exp.logw, atol=1e-9)


def test_dsir_prefers_english_salted_docs(corpus):
    import ray.data as rd

    out = dsir_select(rd.from_pandas(corpus), "is_target",
                      n_select=10, n_buckets=B)
    salted = {i for i in range(120) if i % 3 != 0 and i % 10 == 1}
    # the salted (English-leaning) raw docs dominate the top of the rank
    assert len(set(out.doc_id[:5]) & salted) >= 3
    # weights are descending
    assert list(out.logw) == sorted(out.logw, reverse=True)


def test_dsir_empty_raw(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "c d"],
                       "is_target": [True, True]})
    out = dsir_select(rd.from_pandas(df), "is_target", n_select=5,
                      n_buckets=B)
    assert len(out) == 0 and list(out.columns) == ["doc_id", "logw"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=24), min_size=1, max_size=20))
def test_bucket_hash_matches_duckdb_md5(tokens):
    """_buckets must be bit-parity with DuckDB md5_number_upper % B for
    ARBITRARY unicode tokens (the SQL-twin contract)."""
    import duckdb

    from hybrid_sanctions_search_engine_ray.stages.dsir import _buckets

    got = _buckets(np.array(tokens, dtype=object), 4096)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": tokens}))
    exp = con.execute(
        "SELECT cast(md5_number_upper(s) % 4096 AS BIGINT) FROM t").df().iloc[:, 0]
    assert got.tolist() == exp.tolist()
