import math

import numpy as np

from hybrid_sanctions_search_engine_ray.functions.bm25 import (
    TermPosting,
    idf,
    score_maxscore,
    score_taat,
    tf_factor,
    topk_desc,
)

K1, B = 1.2, 0.75


def test_idf_formula():
    # hand check: N=8, df=2 → ln(1 + 6.5/2.5)
    assert math.isclose(idf(8, 2), math.log(1 + 6.5 / 2.5), rel_tol=1e-12)


def test_tf_factor_hand():
    # tf=3, dl=4, avgdl=4 → 3*2.2/(3+1.2) = 6.6/4.2
    f = tf_factor(np.array([3]), np.array([4]), K1, B, 4.0)
    assert math.isclose(f[0], 6.6 / 4.2, rel_tol=1e-12)


def make_posting(term, n_docs_total, doc_tf_dl, avgdl, block_size=2):
    docs = np.array([d for d, _, _ in doc_tf_dl], dtype=np.uint64)
    tfs = np.array([t for _, t, _ in doc_tf_dl], dtype=np.int64)
    dls = np.array([l for _, _, l in doc_tf_dl], dtype=np.int64)
    f = tf_factor(tfs, dls, K1, B, avgdl)
    return TermPosting(term, float(idf(n_docs_total, docs.size)), docs, f, block_size)


def test_hand_computed_fixture():
    """FIXTURES.md §3: 8 docs, small vocab, hand-derived scores."""
    # term "a": docs 0,1 tf 2,1, dl 4,6 ; term "b": docs 1,2 tf 1,3 dl 6,5; avgdl=5, N=8
    pa_ = make_posting("a", 8, [(0, 2, 4), (1, 1, 6)], 5.0)
    pb = make_posting("b", 8, [(1, 1, 6), (2, 3, 5)], 5.0)
    docs, scores = score_taat([pa_, pb], 10)
    idf_ab = math.log(1 + 6.5 / 2.5)

    def contrib(tf, dl):
        return idf_ab * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 5.0))

    expected = {
        0: contrib(2, 4),
        1: contrib(1, 6) + contrib(1, 6),
        2: contrib(3, 5),
    }
    got = dict(zip(docs.tolist(), scores.tolist()))
    assert set(got) == set(expected)
    for d in expected:
        assert math.isclose(got[d], expected[d], rel_tol=1e-12)


def test_tie_break_doc_id_asc():
    docs = np.array([5, 3, 9], dtype=np.uint64)
    scores = np.array([1.0, 1.0, 2.0])
    d, s = topk_desc(docs, scores, 2)
    assert d.tolist() == [9, 3]  # tie at 1.0 → lower doc id wins


def test_maxscore_equals_taat_random():
    rng = np.random.default_rng(0)
    n_total = 2000
    for trial in range(25):
        n_terms = rng.integers(1, 6)
        postings = []
        for t in range(n_terms):
            n = int(rng.integers(1, 400))
            docs = np.sort(rng.choice(n_total, size=n, replace=False)).astype(np.uint64)
            tfs = rng.integers(1, 8, size=n)
            dls = rng.integers(5, 60, size=n)
            postings.append(make_posting(f"t{t}", n_total, list(zip(docs.tolist(), tfs.tolist(), dls.tolist())), 30.0))
        for k in (1, 5, 37):
            d1, s1 = score_taat(postings, k)
            d2, s2 = score_maxscore(postings, k)
            assert d1.tolist() == d2.tolist(), f"trial {trial} k={k}"
            assert np.allclose(s1, s2, atol=1e-12)


def test_dense_taat_equals_sparse(monkeypatch):
    """The dense accumulator path must be bit-identical to the sparse one."""
    import hybrid_sanctions_search_engine_ray.functions.bm25 as bm

    rng = np.random.default_rng(7)
    postings = []
    for t in range(4):
        n = int(rng.integers(100, 2000))
        docs = np.sort(rng.choice(50_000, size=n, replace=False)).astype(np.uint64)
        tfs = rng.integers(1, 6, size=n)
        dls = rng.integers(5, 80, size=n)
        postings.append(make_posting(f"t{t}", 50_000, list(zip(docs.tolist(), tfs.tolist(), dls.tolist())), 40.0))
    d_sparse, s_sparse = bm.score_taat(postings, 25)
    monkeypatch.setattr(bm, "_DENSE_TAAT_THRESHOLD", 1)        # force dense...
    monkeypatch.setattr(bm, "_DENSE_MAX_SPACE_RATIO", 10**9)   # ...past the density gate
    d_dense, s_dense = bm.score_taat(postings, 25)
    assert d_sparse.tolist() == d_dense.tolist()
    assert np.array_equal(s_sparse, s_dense)


def test_dense_gate_bounded_allocation(monkeypatch):
    """Sparse huge doc-id spaces must NOT take the dense path: with doc
    ids spread to ~10^12, a dense accumulator would allocate terabytes.
    The density gate (max_doc+1 <= ratio*total) forces the sparse
    accumulator, which completes instantly and scores identically."""
    import hybrid_sanctions_search_engine_ray.functions.bm25 as bm

    n = 2048
    docs = (np.arange(n, dtype=np.uint64) * np.uint64(500_000_000))  # max ~10^12
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 20, dtype=np.int64)
    p = make_posting("huge", 10**12, list(zip(docs.tolist(), tfs.tolist(), dls.tolist())), 20.0)
    monkeypatch.setattr(bm, "_DENSE_TAAT_THRESHOLD", 1)  # posting count alone would go dense
    d, s = bm.score_taat([p], 5)                         # must not allocate ~8 TB
    assert d.tolist() == docs[:5].tolist()               # equal scores → doc_id asc tie-break
    assert s.size == 5 and np.all(s > 0)


def test_empty_postings():
    d, s = score_taat([], 10)
    assert d.size == 0 and s.size == 0
    d, s = score_maxscore([], 10)
    assert d.size == 0


def test_bmw_equals_taat_random():
    from hybrid_sanctions_search_engine_ray.functions.bm25 import score_bmw

    rng = np.random.default_rng(11)
    n_total = 2000
    for trial in range(25):
        n_terms = rng.integers(1, 6)
        postings = []
        for t in range(n_terms):
            n = int(rng.integers(1, 400))
            docs = np.sort(rng.choice(n_total, size=n, replace=False)).astype(np.uint64)
            tfs = rng.integers(1, 8, size=n)
            dls = rng.integers(5, 60, size=n)
            postings.append(make_posting(f"t{t}", n_total, list(zip(docs.tolist(), tfs.tolist(), dls.tolist())), 30.0))
        for k in (1, 5, 37):
            d1, s1 = score_taat(postings, k)
            d2, s2 = score_bmw(postings, k)
            assert d1.tolist() == d2.tolist(), f"trial {trial} k={k}"
            assert np.allclose(s1, s2, atol=1e-9)


def test_bmw_tie_breaks_by_doc_id():
    from hybrid_sanctions_search_engine_ray.functions.bm25 import score_bmw

    # identical tf/dl everywhere → exact score ties; smaller doc ids must win
    rows = [(d, 1, 10) for d in range(50)]
    p = make_posting("t", 1000, rows, 10.0)
    d1, s1 = score_taat([p], 7)
    d2, s2 = score_bmw([p], 7)
    assert d1.tolist() == d2.tolist() == list(range(7))
    assert s1.tolist() == s2.tolist()
