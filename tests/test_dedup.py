import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.dedup import (
    MinHasher,
    _shingle_hashes,
    add_md5,
    exact_dedup_groups,
    jaccard_verify,
    minhash_candidate_pairs,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-token change → high jaccard
FAR = "completely different content about database query optimization and distributed systems engineering"


def _docs_table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})


def test_md5_matches_duckdb():
    import duckdb

    t = add_md5(_docs_table(["hello", "мир", ""]))
    con = duckdb.connect()
    for text, h in zip(["hello", "мир", ""], t["text_md5"].to_pylist()):
        assert con.execute("select md5(?)", [text]).fetchone()[0] == h


def test_exact_dedup(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table([BASE, BASE, FAR, BASE]))
    out = exact_dedup_groups(ds).to_pandas().sort_values("keep_doc_id").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[out["n_dups"] == 3, "keep_doc_id"].iloc[0] == 0


def test_minhash_signature_similarity():
    """Sketch property: E[matching minhashes] ≈ Jaccard."""
    mh = MinHasher(num_perm=128, bands=32)
    a = _shingle_hashes(np.array(BASE.split(), dtype=object), 3)
    b = _shingle_hashes(np.array(NEAR.split(), dtype=object), 3)
    c = _shingle_hashes(np.array(FAR.split(), dtype=object), 3)
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    true_ab = len(set(a) & set(b)) / len(set(a) | set(b))
    assert abs(sim_ab - true_ab) < 0.2
    assert sim_ac < 0.1 < sim_ab


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data as rd

    texts = [BASE, NEAR, FAR, "the weather today is sunny with a chance of rain in the late afternoon hours"]
    ds = rd.from_arrow(_docs_table(texts))
    pairs = minhash_candidate_pairs(ds, num_perm=64, bands=16, concurrency=1).to_pandas()
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in found, f"near-dup pair not found: {found}"
    assert (0, 2) not in found and (1, 2) not in found


def test_jaccard_verify():
    pairs = pd.DataFrame({"doc_a": [0], "doc_b": [1]})
    out = jaccard_verify(pairs, {0: BASE, 1: NEAR})
    assert 0.5 < out["jaccard"].iloc[0] < 1.0
    out2 = jaccard_verify(pd.DataFrame({"doc_a": [0], "doc_b": [1]}), {0: BASE, 1: FAR})
    assert out2["jaccard"].iloc[0] < 0.05


def test_simhash_properties():
    t = simhash64(_docs_table([BASE, BASE, NEAR, FAR]), AnalyzerConfig())
    h = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    assert h[0] == h[1]  # identical text → identical hash

    def hamming(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert hamming(h[0], h[2]) < hamming(h[0], h[3]), "near-dup should be closer than unrelated"


def test_simhash_deterministic():
    t1 = simhash64(_docs_table([BASE]), AnalyzerConfig())
    t2 = simhash64(_docs_table([BASE]), AnalyzerConfig())
    assert t1["simhash"].to_pylist() == t2["simhash"].to_pylist()


def test_lsh_oversized_bucket_star_linking():
    """Buckets over max_bucket emit star edges (hub = min doc id): O(B)
    pairs, every doc still connected to the cluster — no silent drops."""
    from hybrid_sanctions_search_engine_ray.stages.dedup import _pairs_from_partition

    g = pd.DataFrame({"band_id": 0, "band_hash": 1, "doc_id": np.arange(500, dtype=np.int64)})
    out = _pairs_from_partition(g, max_bucket=100)
    assert len(out) == 499
    assert (out["doc_a"] == 0).all()
    assert set(out["doc_b"]) == set(range(1, 500))


def test_lsh_small_bucket_all_pairs():
    from hybrid_sanctions_search_engine_ray.stages.dedup import _pairs_from_partition

    g = pd.DataFrame({"band_id": 0, "band_hash": 1, "doc_id": np.array([3, 1, 2, 1], dtype=np.int64)})
    out = _pairs_from_partition(g, max_bucket=100)
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_sorted_neighborhood_pairs_window_and_boundary(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.dedup import sorted_neighborhood_pairs

    # ids deliberately NOT in key order; keys force the sort c<k<m<s<z
    df = pd.DataFrame({"doc_id": np.array([10, 3, 7, 1, 5], np.int64),
                       "key": ["mmm", "ccc", "sss", "kkk", "zzz"]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = sorted_neighborhood_pairs(ds, "doc_id", "key", window=2)
    # sorted order: ccc(3) kkk(1) mmm(10) sss(7) zzz(5); adjacent pairs only
    want = {(1, 3), (1, 10), (7, 10), (5, 7)}
    assert set(zip(out["doc_a"], out["doc_b"])) == want
    # window 3 adds rank-distance-2 pairs
    out3 = sorted_neighborhood_pairs(ds, "doc_id", "key", window=3)
    assert set(zip(out3["doc_a"], out3["doc_b"])) == want | {(3, 10), (1, 7), (5, 10)}
    # keys travel with the normalized (doc_a < doc_b) orientation
    row = out3[(out3.doc_a == 3) & (out3.doc_b == 10)].iloc[0]
    assert row["key_a"] == "ccc" and row["key_b"] == "mmm"
    with pytest.raises(Exception, match="window must be"):
        sorted_neighborhood_pairs(ds, "doc_id", "key", window=1)


# --- dup_ngram_spans ---------------------------------------------------------


def test_dup_ngram_spans_handmath(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.dedup import dup_ngram_spans

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b c d e",        # grams: "a b c", "b c d", "c d e"
            "x a b c y",        # "x a b", "a b c", "b c y"
            "a b c a b c",      # "a b c"×2, "b c a", "c a b"
            "q r s",            # "q r s" — unique, must not appear
        ],
    })
    out = dup_ngram_spans(rd.from_pandas(docs), n=3, min_docs=2, top=10).to_pandas()
    # only "a b c" recurs across >= 2 docs: 1 + 1 + 2 occurrences, 3 docs
    assert out[["gram", "n_occ", "n_docs"]].values.tolist() == [["a b c", 4, 3]]


def test_dup_ngram_spans_order_and_top(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.dedup import dup_ngram_spans

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["p q p q", "p q z w", "z w p q"],
    })
    out = dup_ngram_spans(rd.from_pandas(docs), n=2, min_docs=2, top=2).to_pandas()
    # "p q": docs {0×2, 1, 2} → occ 4; "z w": docs {1, 2} → occ 2; "q p"
    # only in doc 0 → excluded. top=2 keeps both, occ-desc order.
    assert out["gram"].tolist() == ["p q", "z w"]
    assert out["n_occ"].tolist() == [4, 2]
    assert out["n_docs"].tolist() == [3, 2]


def test_dup_ngram_spans_short_docs_skipped(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.dedup import dup_ngram_spans

    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "a b"]})
    out = dup_ngram_spans(rd.from_pandas(docs), n=3, min_docs=2, top=5).to_pandas()
    assert out.empty


# --- line-level dedup (C4 / RefinedWeb) -------------------------------------


def _line_dedup_brute(texts, line_len=8):
    """Reference keep-first over non-overlapping token chunks."""
    import re
    import unicodedata

    seen = {}
    per_doc = {}
    for doc_id, text in enumerate(texts):
        toks = [t for t in re.split(r"[^\w]+", unicodedata.normalize("NFC", text).lower()) if t]
        n_lines = 0
        kept = []
        for i in range(0, len(toks), line_len):
            chunk = toks[i : i + line_len]
            line = " ".join(chunk)
            n_lines += 1
            key = (doc_id, i // line_len)
            if line not in seen:
                seen[line] = key
                kept.append(len(chunk))
        if toks:
            per_doc[doc_id] = (n_lines, len(kept), sum(kept))
    return per_doc


def test_line_dedup_keep_first(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.dedup import line_dedup

    texts = [
        # doc 0: two identical 8-token lines + a 3-token tail
        "a b c d e f g h a b c d e f g h x y z",
        # doc 1: repeats doc 0's first line, then its own
        "a b c d e f g h q r s t u v w x",
        # doc 2: unique content + repeats doc 1's second line
        "m n o p q r s t q r s t u v w x",
        # doc 3: the 3-token tail of doc 0 as a full short doc
        "x y z",
        # doc 4: empty after tokenization (dropped from output)
        "!!! ...",
    ]
    out = (
        line_dedup(rd.from_arrow(_docs_table(texts)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _line_dedup_brute(texts)
    assert list(out["doc_id"]) == sorted(exp)
    for _, r in out.iterrows():
        assert (r["n_lines"], r["n_kept"], r["kept_tokens"]) == exp[r["doc_id"]], r["doc_id"]
    # the duplicate line in doc 0 collapses within the doc too
    assert out.loc[0, "n_lines"] == 3 and out.loc[0, "n_kept"] == 2
    # doc 1 lost its first line to doc 0
    assert out.loc[1, "n_kept"] == 1
    # doc 3's short line already appeared as doc 0's tail chunk
    assert out.loc[3, "n_kept"] == 0 and out.loc[3, "n_lines"] == 1


def test_line_dedup_random_vs_brute(ray_session):
    import random

    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.dedup import line_dedup

    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))) for _ in range(60)]
    out = (
        line_dedup(rd.from_arrow(_docs_table(texts)), line_len=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _line_dedup_brute(texts, line_len=4)
    assert list(out["doc_id"]) == sorted(exp)
    for _, r in out.iterrows():
        assert (r["n_lines"], r["n_kept"], r["kept_tokens"]) == exp[r["doc_id"]]


def test_sorted_neighborhood_block_order_is_numeric(ray_session):
    """Regression: block adjacency must order blocks by the (key, id)
    TUPLE, not by a concatenated string — with a shared key and ids
    whose string order differs from numeric order ("9" > "10"), the old
    stitch emitted wrong cross-boundary pairs."""
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.dedup import sorted_neighborhood_pairs

    n = 60
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "key": ["k"] * n})
    out = sorted_neighborhood_pairs(rd.from_pandas(df).repartition(6),
                                    "doc_id", "key", window=3)
    # ground truth: ids sorted 0..n-1, every pair at rank distance 1 or 2
    exp = {(i, i + d) for d in (1, 2) for i in range(n - d)}
    got = set(zip(out.doc_a, out.doc_b))
    assert got == exp


def test_cdc_chunks_properties(ray_session):
    """CDC boundaries are content-defined: identical docs produce
    identical chunk sets (distinct count collapses), and an edit far
    from a boundary leaves other chunks intact (brute replay)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.dedup import (
        _CDC_A,
        _CDC_MASK,
        _CDC_W,
        cdc_chunk_stats,
    )

    def brute_chunks(s: str) -> list[str]:
        cp = [ord(c) for c in s]
        L = len(cp)
        bps = []
        for p in range(_CDC_W, L):            # 1-based p in [8, L-1]
            h = sum(cp[p - 1 - k] * int(_CDC_A) ** k for k in range(_CDC_W))
            if h % int(_CDC_MASK) == 0:
                bps.append(p)
        ends = bps + [L]
        starts = [0] + bps
        return [s[a:e] for a, e in zip(starts, ends)]

    base = "the quick brown fox jumps over the lazy dog " * 30
    texts = [base, base, base[:500] + "X" + base[500:], "short", ""]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )).repartition(2)
    out = cdc_chunk_stats(ds).iloc[0]

    all_chunks = [c for t in texts if t for c in brute_chunks(t)]
    assert int(out.n_docs) == 4                      # empty doc excluded
    assert int(out.n_chunks) == len(all_chunks)
    assert int(out.n_distinct_chunks) == len(set(all_chunks))
    # duplication: the two identical docs share every chunk
    assert int(out.n_distinct_chunks) < int(out.n_chunks)
    exp_mean = sum(len(c) for c in all_chunks) / len(all_chunks)
    assert out.mean_chunk_len == np.floor(exp_mean * 1e4 + 0.5) / 1e4
    # content-defined: the edited copy still shares most chunks with base
    base_distinct = set(brute_chunks(base))
    shared = base_distinct & set(brute_chunks(texts[2]))
    assert len(shared) >= 0.6 * len(base_distinct)


def test_containment_embedded_doc():
    """A short doc embedded verbatim in a long one: containment ≈ 1
    while Jaccard is small — the signal containment exists for."""
    import pandas as pd

    from hybrid_sanctions_search_engine_ray.stages.dedup import (
        containment_verify,
        jaccard_verify,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long_ = "intro words here " + short + " plus a very long tail " + \
        " ".join(f"tok{i}" for i in range(60))
    texts = {0: short, 1: long_}
    pairs = pd.DataFrame({"doc_a": [0], "doc_b": [1]})
    cont = containment_verify(pairs, texts).iloc[0]
    jac = jaccard_verify(pairs, texts).iloc[0]
    assert cont.cont_a == 1.0                 # every short-shingle is in long
    assert cont.containment == 1.0
    assert jac.jaccard < 0.2                  # resemblance dilutes it


# --- winnowing --------------------------------------------------------------


def test_winnow_matches_bruteforce(ray_session):
    """Vectorized winnowing equals a per-doc brute-force replay of the
    rightmost-window-min rule (partial leading windows included)."""
    import hashlib

    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
    from hybrid_sanctions_search_engine_ray.functions.analyzer import get_analyzer
    from hybrid_sanctions_search_engine_ray.stages.dedup import winnow_fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs",
        "the quick brown fox jumps over the lazy dog again and again",
        "tiny doc",          # shorter than k tokens → no grams
        "one two three",     # exactly k tokens → one gram, one fp
    ]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    k, w = 3, 4
    got = winnow_fingerprints(ds, k=k, w=w)

    an = get_analyzer(AnalyzerConfig())
    all_sites, all_h, n_docs, n_grams = set(), set(), 0, 0
    for d, t in enumerate(texts):
        toks = an(t)
        if len(toks) < k:
            continue
        n_docs += 1
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        hs = [int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
              for g in grams]
        n_grams += len(hs)
        for e in range(len(hs)):
            lo = max(0, e - w + 1)
            win = hs[lo:e + 1]
            mn = min(win)
            p = lo + max(i for i, v in enumerate(win) if v == mn)
            all_sites.add((d, p))
            all_h.add(hs[p])
    row = got.iloc[0]
    assert int(row["n_docs"]) == n_docs
    assert int(row["n_grams"]) == n_grams
    assert int(row["n_fingerprints"]) == len(all_sites)
    assert int(row["n_distinct_fp"]) == len(all_h)


def test_winnow_shared_run_guarantee(ray_session):
    """Two docs sharing a run of >= w+k-1 tokens must share a
    fingerprint hash — the winnowing guarantee (checked through the
    distinct-count arithmetic: duplicating a doc adds sites but no new
    hash values)."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.dedup import winnow_fingerprints

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    one = rd.from_items([{"doc_id": 0, "text": base}])
    two = rd.from_items([{"doc_id": 0, "text": base},
                         {"doc_id": 1, "text": base}])
    a = winnow_fingerprints(one)
    b = winnow_fingerprints(two)
    assert int(b.iloc[0]["n_distinct_fp"]) == int(a.iloc[0]["n_distinct_fp"])
    assert int(b.iloc[0]["n_fingerprints"]) == 2 * int(a.iloc[0]["n_fingerprints"])


def test_winnow_hypothesis_bruteforce():
    """Property: the vectorized winnowing summary equals the per-doc
    brute replay for arbitrary small corpora (unicode words, any doc
    lengths, duplicate docs)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
    from hybrid_sanctions_search_engine_ray.functions.analyzer import get_analyzer
    from hybrid_sanctions_search_engine_ray.stages.dedup import winnow_fingerprints

    words = st.sampled_from(["aa", "bb", "cc", "dd", "чё", "x1"])
    doc = st.lists(words, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=12, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def inner(texts):
        ds = rd.from_items([{"doc_id": i, "text": t}
                            for i, t in enumerate(texts)])
        k, w = 3, 4
        got = winnow_fingerprints(ds, k=k, w=w).iloc[0]
        an = get_analyzer(AnalyzerConfig())
        sites, hashes, n_docs, n_grams = set(), set(), 0, 0
        for d, t in enumerate(texts):
            toks = an(t)
            if len(toks) < k:
                continue
            n_docs += 1
            hs = [int.from_bytes(
                hashlib.md5(" ".join(toks[i:i + k]).encode()).digest()[:8],
                "little") for i in range(len(toks) - k + 1)]
            n_grams += len(hs)
            for e in range(len(hs)):
                lo = max(0, e - w + 1)
                win = hs[lo:e + 1]
                mn = min(win)
                p = lo + max(i for i, v in enumerate(win) if v == mn)
                sites.add((d, p))
                hashes.add(hs[p])
        assert int(got["n_docs"]) == n_docs
        assert int(got["n_grams"]) == n_grams
        assert int(got["n_fingerprints"]) == len(sites)
        assert int(got["n_distinct_fp"]) == len(hashes)

    inner()
