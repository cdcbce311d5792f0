"""TextRank (stages/textrank.py) vs a brute-force integer-PageRank
replay, plus loss_mask_spans ↔ chat_render consistency."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from hybrid_sanctions_search_engine_ray.stages.chatprep import chat_render, loss_mask_spans
from hybrid_sanctions_search_engine_ray.stages.textrank import SCALE, textrank_keywords

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick red fox",
    "lazy dog sleeps",
    "quick quick quick",          # self-adjacency only → contributes no edges
    "singleton",                  # single token → no node
    "fox and dog and fox",
]


def _brute(texts: list[str], n_iter: int, top_n: int) -> pd.DataFrame:
    ew: Counter = Counter()
    for s in texts:
        toks = [t for t in s.lower().split() if t]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                ew[(a, b)] += 1
                ew[(b, a)] += 1
    wout: dict[str, int] = defaultdict(int)
    for (a, _), w in ew.items():
        wout[a] += w
    r = {n: SCALE for n in wout}
    for _ in range(n_iter):
        inflow: dict[str, int] = defaultdict(int)
        for (a, b), w in ew.items():
            inflow[b] += (r[a] * w) // wout[a]
        r = {n: 150_000_000 + (85 * inflow[n]) // 100 for n in wout}
    out = pd.DataFrame({"term": list(r), "rank": list(r.values())})
    return (out.sort_values(["rank", "term"], ascending=[False, True],
                            kind="mergesort").head(top_n).reset_index(drop=True))


def _ts(texts, ray_session, blocks=3):
    import ray.data as rd

    df = pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(len(texts))],
        "turn_idx": np.zeros(len(texts), dtype=np.int32),
        "role": ["user"] * len(texts),
        "text": texts,
        "tool": [""] * len(texts),
    })
    return rd.from_pandas(df).repartition(blocks)


def test_textrank_matches_bruteforce(ray_session):
    out = textrank_keywords(_ts(DOCS, ray_session), n_iter=4, top_n=50)
    exp = _brute(DOCS, 4, 50)
    pd.testing.assert_frame_equal(out, exp)
    assert "singleton" not in set(out.term)      # no adjacency → no node
    # hubs outrank leaves
    ranks = dict(zip(out.term, out["rank"]))
    assert ranks["fox"] > ranks["red"]


def test_textrank_partition_invariance(ray_session):
    a = textrank_keywords(_ts(DOCS, ray_session, blocks=1), n_iter=3, top_n=10)
    b = textrank_keywords(_ts(DOCS, ray_session, blocks=6), n_iter=3, top_n=10)
    pd.testing.assert_frame_equal(a, b)


def test_textrank_sharded_equals_flat(ray_session):
    """The sharded rank-state path (per-shard refs, edges sorted by
    source shard once, streaming shard re-assembly) must be
    BIT-IDENTICAL to the broadcast path — here forced with a tiny
    shard_size so the vocabulary spans many shards, batches straddle
    shard boundaries, and shards with zero in-flow exercise the
    base-fill branch."""
    flat = textrank_keywords(_ts(DOCS, ray_session, blocks=4), n_iter=4, top_n=50)
    for shard_size in (1, 3, 7, 1000):
        sharded = textrank_keywords(_ts(DOCS, ray_session, blocks=4),
                                    n_iter=4, top_n=50, shard_size=shard_size)
        pd.testing.assert_frame_equal(sharded, flat)


def test_textrank_sharded_larger_vocab(ray_session):
    """Synthetic larger-vocabulary corpus: many shards, per-worker state
    bounded to shard_size — results equal the flat path and the brute
    replay."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i:03d}" for i in range(180)]
    docs = [" ".join(rng.choice(vocab, size=12)) for _ in range(60)]
    flat = textrank_keywords(_ts(docs, ray_session, blocks=5), n_iter=3, top_n=40)
    sharded = textrank_keywords(_ts(docs, ray_session, blocks=5),
                                n_iter=3, top_n=40, shard_size=32)
    pd.testing.assert_frame_equal(sharded, flat)
    pd.testing.assert_frame_equal(flat, _brute(docs, 3, 40))


def test_textrank_two_node_closed_form(ray_session):
    # a↔b only: symmetric, each iteration r = 0.15 + 0.85·r (mass conserved)
    out = textrank_keywords(_ts(["alpha beta"], ray_session), n_iter=4, top_n=10)
    assert len(out) == 2
    assert out["rank"].nunique() == 1            # symmetry → equal ranks
    assert abs(int(out["rank"].iloc[0]) - SCALE) <= 4   # fixed point of the update


def test_loss_mask_spans_slice_matches_render(ray_session):
    import ray.data as rd

    rows = [
        ("A", 0, "user", "hi"),
        ("A", 1, "assistant", "hello пётр"),
        ("A", 2, "user", "ok"),
        ("A", 3, "assistant", ""),
        ("B", 0, "assistant", "first"),
    ]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    ds = rd.from_pandas(df).repartition(2)
    rendered = chat_render(ds, num_buckets=4).to_pandas().set_index("conv_id")["rendered"]
    spans = loss_mask_spans(ds, num_buckets=4).to_pandas()
    assert len(spans) == 3
    for _, r in spans.iterrows():
        src = df[(df.conv_id == r.conv_id) & (df.turn_idx == r.turn_idx)].iloc[0]
        assert rendered[r.conv_id][r.start_off:r.end_off] == src.text


def test_hits_brute_and_shape(ray_session):
    """hits_scores vs a brute replay of the integer HITS recipe on a
    small directed graph with an obvious hub."""
    from collections import Counter, defaultdict

    from hybrid_sanctions_search_engine_ray.stages.textrank import hits_scores

    texts = [
        "hub a", "hub b", "hub c", "hub d",     # hub points at many
        "x a", "y a", "z a",                    # a is an authority
        "a b c",
    ]
    out = hits_scores(_ts(texts, ray_session), n_iter=2, top_n=50)

    ew: Counter = Counter()
    for s in texts:
        toks = s.split()
        for u, v in zip(toks, toks[1:]):
            if u != v:
                ew[(u, v)] += 1
    nodes = sorted({u for e in ew for u in e})
    h = {n: SCALE for n in nodes}
    a = {}

    def push(scores, rev):
        raw = defaultdict(int)
        for (u, v), w in ew.items():
            if rev:
                raw[u] += scores[v] * w
            else:
                raw[v] += scores[u] * w
        out_ = {n: 0 for n in nodes}
        mx = max(raw.values()) if raw else 0
        for n, r in raw.items():
            out_[n] = (r * SCALE) // mx if mx else 0
        return out_

    for _ in range(2):
        a = push(h, rev=False)
        h = push(a, rev=True)

    got_h = dict(zip(out[out.kind == "hub"].term, out[out.kind == "hub"].score))
    got_a = dict(zip(out[out.kind == "authority"].term,
                     out[out.kind == "authority"].score))
    for n in got_h:
        assert got_h[n] == h[n]
    for n in got_a:
        assert got_a[n] == a[n]
    # structure: 'hub' tops the hub list, 'a' tops the authorities
    assert out[out.kind == "hub"].iloc[0].term == "hub"
    assert out[out.kind == "authority"].iloc[0].term == "a"


def test_pmi_bigrams_brute(ray_session):
    from collections import Counter, defaultdict

    from hybrid_sanctions_search_engine_ray.stages.textrank import pmi_bigrams

    texts = (["strong coffee"] * 8 + ["strong tea"] * 2
             + ["black coffee"] * 3 + ["black tea"] * 6 + ["tea strong"] * 5)
    out = pmi_bigrams(_ts(texts, ray_session), min_count=2, top_n=10)

    ew: Counter = Counter()
    for s in texts:
        toks = s.split()
        for u, v in zip(toks, toks[1:]):
            if u != v:
                ew[(u, v)] += 1
    cl, cr = defaultdict(int), defaultdict(int)
    for (u, v), w in ew.items():
        cl[u] += w
        cr[v] += w
    n = sum(ew.values())
    rows = []
    for (u, v), w in ew.items():
        if w >= 2:
            pmi = np.log(n * w / (cl[u] * cr[v]))
            rows.append((u, v, w, np.sign(pmi) * np.floor(abs(pmi) * 1e4 + 0.5) / 1e4))
    exp = (pd.DataFrame(rows, columns=["s", "t", "n_pair", "pmi"])
           .sort_values(["pmi", "s", "t"], ascending=[False, True, True],
                        kind="mergesort").head(10).reset_index(drop=True))
    exp["n_pair"] = exp["n_pair"].astype(np.int64)
    pd.testing.assert_frame_equal(out, exp)
    # the dominant collocation ranks first
    assert tuple(out.iloc[0][["s", "t"]]) in {("strong", "coffee"), ("tea", "strong"), ("black", "tea")}


def test_personalized_pagerank_topical(ray_session):
    """Seed mass stays near the seeds: direct neighbours outrank
    disconnected parts of the graph; brute replay exact."""
    from collections import Counter, defaultdict

    from hybrid_sanctions_search_engine_ray.stages.textrank import (
        _BASE,
        personalized_pagerank,
    )

    texts = ["seed near near2", "seed near", "far faraway", "faraway far other"]
    out = personalized_pagerank(_ts(texts, ray_session), ["seed"],
                                n_iter=3, top_n=20)
    ranks = dict(zip(out.term, out["rank"].astype(int)))
    assert ranks["seed"] >= _BASE                 # restart mass
    assert "near" in ranks
    assert "far" not in ranks and "faraway" not in ranks  # unreachable: rank 0

    # brute replay
    ew: Counter = Counter()
    for s in texts:
        toks = s.split()
        for u, v in zip(toks, toks[1:]):
            if u != v:
                ew[(u, v)] += 1
                ew[(v, u)] += 1
    wout: dict[str, int] = defaultdict(int)
    for (u, _), w in ew.items():
        wout[u] += w
    base = {n: (_BASE if n == "seed" else 0) for n in wout}
    r = dict(base)
    for _ in range(3):
        inflow: dict[str, int] = defaultdict(int)
        for (u, v), w in ew.items():
            inflow[v] += (r[u] * w) // wout[u]
        r = {n: base[n] + (85 * inflow[n]) // 100 for n in wout}
    for t, v in ranks.items():
        assert v == r[t]


def test_textrank_sharded_boundary_ties(ray_session):
    """shard_size > top_n with rank TIES at the per-shard k-th boundary
    (the production regime — code-review r05): many isolated-pair terms
    share identical ranks, so the per-shard truncation must resolve the
    boundary by the same (rank desc, term asc) order the final merge
    uses, or a tied term the flat path returns gets dropped."""
    # 40 disjoint symmetric pairs → 80 nodes with IDENTICAL structure
    # (and identical integer ranks), vocabulary split across shards
    docs = [f"pair{i:02d}a pair{i:02d}b" for i in range(40)] * 3
    flat = textrank_keywords(_ts(docs, ray_session, blocks=4), n_iter=3, top_n=10)
    for shard_size in (15, 33, 64):
        sharded = textrank_keywords(_ts(docs, ray_session, blocks=4),
                                    n_iter=3, top_n=10, shard_size=shard_size)
        pd.testing.assert_frame_equal(sharded, flat)
