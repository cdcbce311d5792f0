"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
PageRank over the corpus-wide word-adjacency graph.

Graph: nodes are analyzed terms; a directed edge u→v with weight
``w(u,v)`` = number of times v appears immediately after u (or u after
v — adjacency is symmetrized by emitting both directions) inside a
document, self-loops dropped. The PageRank update with damping d:

    r_{t+1}(v) = (1 − d) + d · Σ_{u→v} r_t(u) · w(u,v) / W(u)

with ``W(u) = Σ_v w(u,v)`` the total out-weight.

Determinism contract: all rank arithmetic is INTEGER — ranks live at
scale 1e9 and each edge contribution is ``(r_u * w) // W_u`` (floor),
the damped update is ``150_000_000 + (85 * Σ contrib) // 100``. No
float ever enters, so the result is independent of summation order,
batching, retries and cluster size, and every iteration is exactly
replicable in DuckDB BIGINT arithmetic (the SQL twin chains one CTE
per iteration). Published TextRank uses float PageRank; the integer
quantization (9 decimal digits) changes ranks by <1e-9·K and is the
price of an exact distributed contract — the repo-wide rule.

Scale shape:
- Edge building is the corpus-sized pass: one streaming tokenize
  (``flat_terms``), vectorized shifted-array adjacency per batch,
  per-batch partial counts (Arrow group_by), then ONE (u,v)-keyed
  shuffle to total weights — bigram-vocabulary-sized, the same class
  as the shingle index build.
- Iterations touch only the EDGE table: ranks and out-weights are
  node-(vocabulary-)sized and are broadcast via ``ray.put`` once per
  iteration (the established idf-broadcast pattern); each iteration is
  one map over edge blocks + one node-sized groupby-sum. K iterations
  = K small shuffles; the corpus is never re-read.
- Terms that never sit adjacent to a different term (single-token
  documents) have no node — standard TextRank ranks graph nodes only.

Reference analog: none (keyword extraction is adjacent to the
doc_keywords TF-IDF op); this is the catalog's iterative-algorithm
representative alongside connected components (stages/clusters.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

SCALE = 1_000_000_000  # initial rank; 0.15/0.85 damping in integers
_BASE = 150_000_000
_D_NUM, _D_DEN = 85, 100


def _adjacency_partial(batch: pa.Table, cfg: AnalyzerConfig,
                       symmetric: bool = True) -> pa.Table:
    """Per-batch adjacency counts (s, t, c_p); ``symmetric=False`` keeps
    only the forward (s precedes t) direction — the directed graph HITS
    runs on."""
    parent, terms = flat_terms(batch, cfg)
    empty = pa.table({"s": pa.array([], pa.string()),
                      "t": pa.array([], pa.string()),
                      "c_p": pa.array([], pa.int64())})
    if parent.size < 2:
        return empty
    tarr = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
    same_doc = parent[1:] == parent[:-1]
    a = tarr.slice(0, len(tarr) - 1)
    b = tarr.slice(1)
    keep = same_doc & (a.to_numpy(zero_copy_only=False) != b.to_numpy(zero_copy_only=False))
    at = np.flatnonzero(keep)
    if at.size == 0:
        return empty
    ai = pa.array(at, pa.int64())
    bi = pa.array(at + 1, pa.int64())
    if symmetric:
        s = pa.concat_arrays([tarr.take(ai), tarr.take(bi)])
        t = pa.concat_arrays([tarr.take(bi), tarr.take(ai)])
    else:
        s, t = tarr.take(ai), tarr.take(bi)
    g = pa.table({"s": s, "t": t}).group_by(["s", "t"]).aggregate([([], "count_all")])
    return pa.table({"s": g["s"], "t": g["t"],
                     "c_p": g["count_all"].cast(pa.int64())})


def build_adjacency(transcripts_ds, cfg: AnalyzerConfig | None = None,
                    symmetric: bool = True):
    """Corpus → edge Dataset (s, t, w); symmetrized by default."""
    from ray.data.aggregate import Sum

    cfg = cfg or AnalyzerConfig()
    return (
        transcripts_ds.map_batches(lambda b: _adjacency_partial(b, cfg, symmetric),
                                   batch_format="pyarrow")
        .groupby(["s", "t"])
        .aggregate(Sum("c_p", alias_name="w"))
    )


def textrank_keywords(transcripts_ds, n_iter: int = 4, top_n: int = 20,
                      cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Top-``top_n`` terms by integer PageRank after ``n_iter`` damped
    iterations; returns (term, rank) ordered by (rank desc, term)."""
    import ray
    from ray.data.aggregate import Sum

    edges = build_adjacency(transcripts_ds, cfg).materialize()

    # node-sized out-weights, broadcast once
    wout = edges.groupby("s").aggregate(Sum("w", alias_name="W")).to_pandas()
    nodes = wout["s"].to_numpy(dtype=object)
    w_of = dict(zip(nodes, wout["W"].astype(np.int64)))
    w_ref = ray.put(w_of)
    ranks = {n: SCALE for n in nodes}

    for _ in range(n_iter):
        r_ref = ray.put(ranks)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            r = ray.get(r_ref)
            w_map = ray.get(w_ref)
            s = b["s"].to_numpy(dtype=object)
            ru = np.array([r[x] for x in s], dtype=np.int64)
            wu = np.array([w_map[x] for x in s], dtype=np.int64)
            w = b["w"].to_numpy().astype(np.int64)
            return pd.DataFrame({"t": b["t"], "c": (ru * w) // wu})

        new = (
            edges.map_batches(contrib, batch_format="pandas")
            .groupby("t")
            .aggregate(Sum("c", alias_name="sc"))
            .to_pandas()
        )
        ranks = {n: _BASE for n in nodes}  # nodes with no in-flow keep the base
        t_arr = new["t"].to_numpy(dtype=object)
        sc = new["sc"].astype(np.int64).to_numpy()
        for i in range(len(t_arr)):
            ranks[t_arr[i]] = _BASE + (_D_NUM * int(sc[i])) // _D_DEN

    out = pd.DataFrame({"term": list(ranks), "rank": list(ranks.values())})
    out["rank"] = out["rank"].astype(np.int64)
    out = out.sort_values(["rank", "term"], ascending=[False, True],
                          kind="mergesort").head(top_n)
    return out.reset_index(drop=True)


def hits_scores(transcripts_ds, n_iter: int = 2, top_n: int = 10,
                cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) over the DIRECTED
    word-adjacency graph (s → t iff t ever immediately follows s):
    per iteration ``a(v) = Σ_{u→v} w·h(u)`` then ``h(u) = Σ_{u→v} w·a(v)``,
    each re-normalized to max = SCALE (1e9) with integer floor division — the
    same all-integer determinism contract as TextRank, so every step is
    exactly replicable in SQL (a/h/max CTE triple per iteration).

    Scale shape: identical to TextRank — the directed edge table is the
    only corpus-derived state; scores are node-sized broadcasts; each
    half-iteration is one map over edge blocks + one node-sized
    groupby-sum. Returns the top-``top_n`` rows per kind:
    (kind ∈ {hub, authority}, term, score)."""
    import ray
    from ray.data.aggregate import Sum

    edges = build_adjacency(transcripts_ds, cfg, symmetric=False).materialize()
    # distinct node set (node-sized): one groupby over both endpoints
    both = edges.map_batches(
        lambda b: pa.table({"n": pa.concat_arrays(
            [pa.array(b["s"].to_numpy(zero_copy_only=False), pa.string()),
             pa.array(b["t"].to_numpy(zero_copy_only=False), pa.string())]),
            "one": pa.array(np.ones(2 * len(b), np.int64))}),
        batch_format="pyarrow").groupby("n").aggregate(Sum("one", alias_name="c")).to_pandas()
    nodes = both["n"].to_numpy(dtype=object)

    a = {n: SCALE for n in nodes}
    h = {n: SCALE for n in nodes}

    def _push(scores: dict, src_col: str, dst_col: str) -> dict:
        ref = ray.put(scores)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            sc = ray.get(ref)
            src = b[src_col].to_numpy(dtype=object)
            w = b["w"].to_numpy().astype(np.int64)
            val = np.array([sc[x] for x in src], dtype=np.int64)
            return pd.DataFrame({"t": b[dst_col], "c": val * w})

        agg = (edges.map_batches(contrib, batch_format="pandas")
               .groupby("t").aggregate(Sum("c", alias_name="sc")).to_pandas())
        out = {n: 0 for n in nodes}
        for t_, v in zip(agg["t"].to_numpy(dtype=object),
                         agg["sc"].astype(np.int64).to_numpy()):
            out[t_] = int(v)
        mx = max(out.values()) if out else 0
        if mx > 0:
            out = {k: (v * SCALE) // mx for k, v in out.items()}
        return out

    for _ in range(n_iter):
        a = _push(h, "s", "t")   # authorities gather from hubs
        h = _push(a, "t", "s")   # hubs gather from authorities

    def _top(scores: dict, kind: str) -> pd.DataFrame:
        df = pd.DataFrame({"term": list(scores), "score": list(scores.values())})
        df["score"] = df["score"].astype(np.int64)
        df = df.sort_values(["score", "term"], ascending=[False, True],
                            kind="mergesort").head(top_n)
        df.insert(0, "kind", kind)
        return df

    return pd.concat([_top(h, "hub"), _top(a, "authority")],
                     ignore_index=True)


def pmi_bigrams(transcripts_ds, min_count: int = 5, top_n: int = 20,
                cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Collocation extraction by pointwise mutual information (Church &
    Hanks 1990) over ORDERED adjacent term pairs:
    ``pmi(u,v) = ln(N · c(u,v) / (c_left(u) · c_right(v)))`` with the
    marginals counted in the matching slot (u as left element, v as
    right) and N = total bigram occurrences — the classic multi-word-
    unit signal feeding tokenizer-vocab curation.

    Scale shape: ONE directed-adjacency edge shuffle (shared with
    TextRank/HITS), two node-sized marginal groupbys broadcast once, a
    scoring map over edge blocks with batch-local top-n partials, tiny
    driver merge. Returns (s, t, n_pair, pmi round4) by (pmi desc, s, t).
    """
    import ray
    from ray.data.aggregate import Sum

    edges = build_adjacency(transcripts_ds, cfg, symmetric=False).materialize()
    left = edges.groupby("s").aggregate(Sum("w", alias_name="cl")).to_pandas()
    right = edges.groupby("t").aggregate(Sum("w", alias_name="cr")).to_pandas()
    n_total = int(left["cl"].sum())
    cl = dict(zip(left["s"].to_numpy(dtype=object), left["cl"].astype(np.int64)))
    cr = dict(zip(right["t"].to_numpy(dtype=object), right["cr"].astype(np.int64)))
    ref = ray.put({"cl": cl, "cr": cr, "n": n_total})

    def score(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        w = b["w"].to_numpy().astype(np.int64)
        keep = w >= min_count
        if not keep.any():
            return pd.DataFrame({"s": pd.Series([], dtype=object),
                                 "t": pd.Series([], dtype=object),
                                 "n_pair": pd.Series([], dtype=np.int64),
                                 "pmi": pd.Series([], dtype=float)})
        s = b["s"].to_numpy(dtype=object)[keep]
        t = b["t"].to_numpy(dtype=object)[keep]
        w = w[keep]
        a = np.array([st["cl"][x] for x in s], dtype=np.float64)
        c = np.array([st["cr"][x] for x in t], dtype=np.float64)
        pmi = np.log(st["n"] * w.astype(np.float64) / (a * c))
        pmi = np.sign(pmi) * np.floor(np.abs(pmi) * 1e4 + 0.5) / 1e4
        out = pd.DataFrame({"s": s, "t": t, "n_pair": w, "pmi": pmi})
        return out.sort_values(["pmi", "s", "t"],
                               ascending=[False, True, True],
                               kind="mergesort").head(top_n)

    cand = edges.map_batches(score, batch_format="pandas").to_pandas()
    return (cand.sort_values(["pmi", "s", "t"], ascending=[False, True, True],
                             kind="mergesort").head(top_n).reset_index(drop=True))


def personalized_pagerank(transcripts_ds, seeds: list[str], n_iter: int = 4,
                          top_n: int = 20,
                          cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Topic-sensitive PageRank (Haveliwala, WWW 2002): the restart
    mass lands ONLY on the seed terms, so the stationary-ish scores
    rank the vocabulary by proximity to the seed topic — the
    related-term expansion primitive. Same integer contract as
    TextRank with a seed-conditional base:

        r_{t+1}(v) = (v ∈ seeds ? 150_000_000 : 0)
                     + (85 · Σ_{u→v} (r_t(u)·w) // W(u)) // 100

    Same shuffle shape too: one symmetric edge build, K broadcast-rank
    iterations over edge blocks. Returns top-``top_n`` (term, rank),
    seeds included (they dominate by construction)."""
    import ray
    from ray.data.aggregate import Sum

    edges = build_adjacency(transcripts_ds, cfg).materialize()
    wout = edges.groupby("s").aggregate(Sum("w", alias_name="W")).to_pandas()
    nodes = wout["s"].to_numpy(dtype=object)
    w_of = dict(zip(nodes, wout["W"].astype(np.int64)))
    w_ref = ray.put(w_of)
    seed_set = set(seeds)
    base = {n: (_BASE if n in seed_set else 0) for n in nodes}
    ranks = dict(base)

    for _ in range(n_iter):
        r_ref = ray.put(ranks)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            r = ray.get(r_ref)
            w_map = ray.get(w_ref)
            s = b["s"].to_numpy(dtype=object)
            ru = np.array([r[x] for x in s], dtype=np.int64)
            wu = np.array([w_map[x] for x in s], dtype=np.int64)
            w = b["w"].to_numpy().astype(np.int64)
            keep = ru > 0                 # sparse frontier: zero mass emits nothing
            return pd.DataFrame({"t": b["t"].to_numpy(dtype=object)[keep],
                                 "c": ((ru * w) // wu)[keep]})

        agg = (edges.map_batches(contrib, batch_format="pandas")
               .groupby("t").aggregate(Sum("c", alias_name="sc")).to_pandas())
        ranks = dict(base)
        for t_, v in zip(agg["t"].to_numpy(dtype=object),
                         agg["sc"].astype(np.int64).to_numpy()):
            ranks[t_] = base[t_] + (_D_NUM * int(v)) // _D_DEN

    out = pd.DataFrame({"term": list(ranks), "rank": list(ranks.values())})
    out = out[out["rank"] > 0]
    out["rank"] = out["rank"].astype(np.int64)
    return (out.sort_values(["rank", "term"], ascending=[False, True],
                            kind="mergesort").head(top_n).reset_index(drop=True))
