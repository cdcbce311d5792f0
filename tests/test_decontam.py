"""Benchmark-decontamination stage (stages/decontam.py).

Python brute-force oracle: shingle each text with the same simple-mode
tokenization and test set membership.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.stages.decontam import (
    bench_shingle_set,
    contamination_hits,
    decontaminate,
    word_wgrams,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a totally unrelated sentence about databases and indexes"),
    (2, "Quick Brown FOX jumps high"),  # shares 'quick brown fox jumps' w=4 after lower
    (3, "the quick brown"),  # only 3 tokens -> no w=4 shingle
    (4, ""),  # empty
    (5, "the... quick---brown fox!!! jumps"),  # separators stripped, tokens adjacent
    (6, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
]


def _brute_shingles(text: str, w: int) -> set[str]:
    import regex

    toks = [t for t in regex.split(r"[^\p{L}\p{N}]+", text.lower()) if t]
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def _mkds():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    )


def test_word_wgrams_matches_brute():
    parent, grams = word_wgrams(pa.array([t for _, t in DOCS]), 4)
    got: dict[int, set] = {}
    for p, g in zip(parent.tolist(), grams.to_pylist()):
        got.setdefault(p, set()).add(g)
    for i, (_, text) in enumerate(DOCS):
        assert got.get(i, set()) == _brute_shingles(text, 4), i


def test_word_wgrams_w1_and_bad_w():
    parent, grams = word_wgrams(pa.array(["a b", ""]), 1)
    assert grams.to_pylist() == ["a", "b"]
    assert parent.tolist() == [0, 0]
    with pytest.raises(ValueError):
        word_wgrams(pa.array(["x"]), 0)


def test_hits_and_clean_partition_corpus():
    bench = [DOCS[0][1]]  # doc 0 is the benchmark
    ds = _mkds()
    hits = contamination_hits(ds, bench, w=4).to_pandas()
    clean = decontaminate(ds, bench, w=4).to_pandas()
    # docs 0 (self), 2 (case-folded overlap), 5 (separator-stripped), 6 (dup)
    assert sorted(hits["doc_id"]) == [0, 2, 5, 6]
    assert sorted(clean["doc_id"]) == [1, 3, 4]
    assert set(hits["doc_id"]).isdisjoint(clean["doc_id"])
    # n_hits = DISTINCT benchmark shingles contained
    bset = _brute_shingles(bench[0], 4)
    exp = {d: len(_brute_shingles(t, 4) & bset) for d, t in DOCS}
    for _, r in hits.iterrows():
        assert int(r["n_hits"]) == exp[int(r["doc_id"])]


def test_empty_benchmark_keeps_everything():
    ds = _mkds()
    assert contamination_hits(ds, [], w=4).count() == 0
    assert contamination_hits(ds, ["a b"], w=4).count() == 0  # too short to shingle
    assert decontaminate(ds, [], w=4).count() == len(DOCS)


def test_bench_shingle_set_distinct():
    s = bench_shingle_set(["x y z x y z x y z"], 3)
    assert sorted(s.to_pylist()) == sorted({"x y z", "y z x", "z x y"})


def test_repeated_shingle_counted_once():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10], pa.int64()),
                "text": pa.array(["p q r s p q r s p q r s"], pa.string()),
            }
        )
    )
    hits = contamination_hits(ds, ["p q r s"], w=4).to_pandas()
    assert len(hits) == 1
    # doc contains 'p q r s' 3 times but only 1 DISTINCT benchmark shingle
    assert int(hits["n_hits"].iloc[0]) == 1
    assert hits["doc_id"].dtype == np.int64
