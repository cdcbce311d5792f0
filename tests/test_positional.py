"""Positional index: codec roundtrip, positional emit, phrase search
without stored text."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.functions.codec import decode_positions, encode_positions
from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader, phrase_search
from hybrid_sanctions_search_engine_ray.stages.analyze import emit_postings_positional

CFG = EngineConfig(num_partitions=4, analyzer=AnalyzerConfig(mode="simple"))


def test_positions_codec_roundtrip():
    per_doc = [np.array([0, 3, 17]), np.array([2]), np.array([5, 6, 7, 900])]
    flat = np.concatenate(per_doc)
    counts = np.array([len(p) for p in per_doc])
    buf = encode_positions(flat, counts)
    out, offsets = decode_positions(buf, counts)
    assert np.array_equal(out.astype(np.int64), flat)
    assert offsets.tolist() == [0, 3, 4, 8]


def test_positions_codec_empty():
    out, offsets = decode_positions(encode_positions(np.empty(0), np.empty(0, dtype=np.int64)),
                                    np.empty(0, dtype=np.int64))
    assert out.size == 0 and offsets.tolist() == [0]


def test_emit_postings_positional():
    batch = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": pa.array(["a b a c", "c c b"], pa.string()),
        }
    )
    out = emit_postings_positional(batch, CFG)
    rows = {(r["term"], r["doc_id"]): r for r in out.to_pylist()}
    assert rows[("a", 7)]["tf"] == 2 and rows[("a", 7)]["pos"] == [0, 2]
    assert rows[("b", 7)]["pos"] == [1]
    assert rows[("c", 7)]["pos"] == [3]
    assert rows[("c", 8)]["pos"] == [0, 1] and rows[("b", 8)]["pos"] == [2]
    assert all(r["dl"] == 4 for (t, d), r in rows.items() if d == 7)


TEXTS = [
    "alpha beta gamma delta",          # "beta gamma" at 1
    "beta alpha gamma delta",          # terms present, phrase absent
    "the alpha beta gamma song",       # "beta gamma" at 2
    "unrelated words entirely here",
    "Beta, Gamma!",                    # analyzer folds case/punct
    "beta beta gamma",                 # repeated first term
]


@pytest.fixture(scope="module")
def pos_index(tmp_path_factory, ray_session):
    import ray.data as rd

    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
        for i, t in enumerate(TEXTS)
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    idx = str(tmp_path_factory.mktemp("posidx") / "idx")
    m = build_index("mem", idx, CFG, transcripts_ds=ds, store_positions=True)
    assert m.store_positions
    return idx


def test_phrase_positional_contiguous_only(pos_index):
    out = phrase_search(pos_index, "beta gamma", top_k=10)
    assert set(out["doc_id"]) == {0, 2, 4, 5}
    assert out["score"].is_monotonic_decreasing


def test_phrase_positional_no_stored_text(pos_index):
    """The positional path never touches stored text (none exists)."""
    import pyarrow.dataset as pads
    import os

    dm = pads.dataset(os.path.join(pos_index, "docmap.parquet"))
    assert "text" not in dm.schema.names  # built via doc_id path, no store_text
    out = phrase_search(pos_index, "gamma beta", top_k=10)
    assert len(out) == 0  # reversed order never contiguous


def test_phrase_positional_matches_text_verify(ray_session, tmp_path):
    """Positional phrase results == retrieve-then-verify results on the
    same corpus (same docs, same BM25-ordering)."""
    import ray.data as rd

    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
        for i, t in enumerate(TEXTS)
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    tidx = str(tmp_path / "tidx")
    build_index("mem", tidx, CFG, transcripts_ds=ds, store_text=True)

    rows2 = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
        for i, t in enumerate(TEXTS)
    ]
    ds2 = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows2), preserve_index=False))
    pidx = str(tmp_path / "pidx")
    build_index("mem", pidx, CFG, transcripts_ds=ds2, store_positions=True)

    for phrase in ["beta gamma", "alpha beta gamma", "gamma beta", "the alpha"]:
        a = phrase_search(tidx, phrase, top_k=10)
        b = phrase_search(pidx, phrase, top_k=10)
        assert list(a["doc_id"]) == list(b["doc_id"]), phrase
        assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy())


def test_positional_repeated_term_phrase(pos_index):
    out = phrase_search(pos_index, "beta beta gamma", top_k=10)
    assert set(out["doc_id"]) == {5}


def test_span_or_near_union_semantics(ray_session, pos_index):
    """A doc matching via EITHER alternative of a clause must match;
    chain feasibility uses the union of clause positions; scoring takes
    the best member per clause."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.pipelines.search_features import (
        span_near_search,
        span_or_near_search,
    )

    # single-alternative clauses == plain ordered span_near
    qs = [{"query_id": "q", "query_text": "alpha beta", "slop": 1, "top_k": 10}]
    a = span_or_near_search(rd.from_items(qs), pos_index).to_pandas()
    b = span_near_search(rd.from_items(qs), pos_index).to_pandas()
    assert list(a.doc_id) == list(b.doc_id)
    np.testing.assert_allclose(a.score, b.score, atol=1e-12)

    # or-clause widens the match set (superset of either single chain)
    qs_or = [{"query_id": "q", "query_text": "beta gamma|delta", "slop": 1,
              "top_k": 10}]
    c = span_or_near_search(rd.from_items(qs_or), pos_index).to_pandas()
    bg = span_near_search(rd.from_items(
        [{"query_id": "q", "query_text": "beta gamma", "slop": 1, "top_k": 10}]),
        pos_index).to_pandas()
    bd = span_near_search(rd.from_items(
        [{"query_id": "q", "query_text": "beta delta", "slop": 1, "top_k": 10}]),
        pos_index).to_pandas()
    assert set(c.doc_id) >= set(bg.doc_id) | set(bd.doc_id)
    assert len(c) >= max(len(bg), len(bd)) >= 1


def test_span_multi_prefix_expansion_equivalence(ray_session, pos_index):
    """span_multi's prefix clause must equal the hand-expanded span_or
    clause; an unmatched prefix makes the query unmatchable."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.pipelines.search_features import (
        span_multi_near_search,
        span_or_near_search,
    )

    # "bet*" expands to {beta}; "gamm*" to {gamma} in this vocab
    got = span_multi_near_search(
        [{"query_id": "q", "query_text": "bet* gamm*", "slop": 1, "top_k": 10}],
        pos_index).to_pandas()
    want = span_or_near_search(rd.from_items(
        [{"query_id": "q", "query_text": "beta gamma", "slop": 1, "top_k": 10}]),
        pos_index).to_pandas()
    assert list(got.doc_id) == list(want.doc_id) and len(got) >= 1
    np.testing.assert_allclose(got.score, want.score, atol=1e-12)

    # a prefix matching several dictionary terms widens the clause:
    # "b*"/"g*" covers at least everything "beta gamma" matched
    wide = span_multi_near_search(
        [{"query_id": "q", "query_text": "b* g*", "slop": 1, "top_k": 10}],
        pos_index).to_pandas()
    assert set(wide.doc_id) >= set(want.doc_id)

    # unmatched prefix -> empty span clause -> no rows
    none = span_multi_near_search(
        [{"query_id": "q", "query_text": "zzz* gamma", "slop": 1, "top_k": 10}],
        pos_index).to_pandas()
    assert len(none) == 0
