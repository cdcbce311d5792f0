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

Scale shape (round-4 factorized state):
- Edge building is the corpus-sized pass: one streaming tokenize
  (``flat_terms``), vectorized shifted-array adjacency per batch,
  per-batch partial counts (Arrow group_by), then ONE (u,v)-keyed
  shuffle to total weights — bigram-vocabulary-sized, the same class
  as the shingle index build.
- Node terms are FACTORIZED once into dense int64 ids
  (:func:`factorize_edge_graph`): the edge table is converted to
  (s_id, t_id, w) int columns in one actor-pool pass (a hash index
  built once per actor, vectorized ``pd.Index.get_indexer`` per
  batch), and every per-iteration broadcast is a plain int64 NUMPY
  ARRAY — zero-copy through the object store (~8 bytes/node vs ~100+
  for the earlier Python-dict state) and indexed with vectorized fancy
  indexing instead of a per-edge Python loop. Iterations touch only
  the int edge table: K iterations = K node-sized groupby-sums; the
  corpus is never re-read. (At a vocabulary too large for one driver
  array the factorize step itself becomes a distributed join — the
  documented next rung; the per-iteration exchange shape is already
  right.)
- Integer-overflow guards: every per-batch ``r_u * w`` multiply
  asserts ``max(r_u) ≤ (2^63−1)/max(w)`` so a pathological
  hub-weight combination fails loudly instead of silently wrapping
  (the SQL twin runs in BIGINT/HUGEINT and would diverge, not wrap).
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
_I64_MAX = 2**63 - 1


def _guard_mul(a: np.ndarray, b: np.ndarray, what: str) -> None:
    """Fail loudly if element-wise ``a * b`` could exceed int64."""
    if a.size and b.size:
        am, bm = int(a.max()), int(b.max())
        if am > 0 and bm > 0 and am > _I64_MAX // bm:
            raise OverflowError(
                f"{what}: int64 overflow risk (max operands {am} × {bm}); "
                f"rescale ranks or shard the graph")


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


class _EdgeToIds:
    """Actor body for the one-time string→id edge conversion: the hash
    index over the sorted node array is built ONCE per actor from the
    broadcast ref; each batch is two vectorized ``get_indexer`` calls."""

    def __init__(self, nodes_ref):
        import ray

        self.idx = pd.Index(ray.get(nodes_ref))

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "s_id": self.idx.get_indexer(b["s"]).astype(np.int64),
            "t_id": self.idx.get_indexer(b["t"]).astype(np.int64),
            "w": b["w"].to_numpy().astype(np.int64),
        })


def factorize_edge_graph(edges, symmetric: bool = False):
    """String-keyed edge Dataset (s, t, w) → ``(nodes, W_arr, edges_int)``:
    ``nodes`` is the sorted distinct term array (driver-side, the id→term
    map), ``W_arr`` the id-aligned int64 out-weight array (Σw per
    source), ``edges_int`` a materialized Dataset (s_id, t_id, w int64)
    with ids = positions in ``nodes``. ``symmetric=True`` (TextRank/PPR
    graphs, where every node appears as a source) derives the node set
    from the SAME out-weight groupby — one node-sized exchange total;
    directed graphs (HITS/PMI) take one extra union groupby. Then one
    actor-pool conversion pass; strings never enter an iteration again."""
    import ray
    from ray.data.aggregate import Sum

    wout = edges.groupby("s").aggregate(Sum("w", alias_name="W")).to_pandas()
    if symmetric:
        order = np.argsort(wout["s"].to_numpy(dtype=object), kind="mergesort")
        nodes = wout["s"].to_numpy(dtype=object)[order]
        W_arr = wout["W"].to_numpy().astype(np.int64)[order]
    else:
        both = (
            edges.map_batches(
                lambda b: pa.table({"n": pa.concat_arrays(
                    [pa.array(b["s"].to_numpy(zero_copy_only=False), pa.string()),
                     pa.array(b["t"].to_numpy(zero_copy_only=False), pa.string())]),
                    "one": pa.array(np.ones(2 * len(b), np.int64))}),
                batch_format="pyarrow")
            .groupby("n").aggregate(Sum("one", alias_name="c")).to_pandas()
        )
        nodes = np.sort(both["n"].to_numpy(dtype=object))
        W_arr = np.zeros(nodes.size, dtype=np.int64)
        idx = pd.Index(nodes)
        W_arr[idx.get_indexer(wout["s"])] = wout["W"].to_numpy().astype(np.int64)
    nodes_ref = ray.put(nodes)
    if nodes.size <= 200_000:
        # small vocabulary: per-task index rebuild is cheaper than actor
        # pool startup (stateless task pool, no pool warm-up latency)
        def conv(b: pd.DataFrame) -> pd.DataFrame:
            idx = pd.Index(ray.get(nodes_ref))
            return pd.DataFrame({
                "s_id": idx.get_indexer(b["s"]).astype(np.int64),
                "t_id": idx.get_indexer(b["t"]).astype(np.int64),
                "w": b["w"].to_numpy().astype(np.int64)})

        edges_int = edges.map_batches(conv, batch_format="pandas").materialize()
    else:
        edges_int = edges.map_batches(
            _EdgeToIds, fn_constructor_args=(nodes_ref,),
            batch_format="pandas", concurrency=2).materialize()
    return nodes, W_arr, edges_int


#: node count above which textrank_keywords switches to the SHARDED
#: rank-state path automatically (below it, one broadcast array per
#: iteration is cheaper than shard bookkeeping). ~5e6 int64 ranks =
#: 40 MB/worker broadcast — the comfortable ceiling for the flat path.
SHARD_AT_NODES = 5_000_000


def _textrank_sharded(eint, W_arr, V: int, n_iter: int,
                      shard_size: int) -> list:
    """TextRank iterations with rank state SHARDED by node-id range —
    the bounded-per-worker-state path for vocabularies past
    ``SHARD_AT_NODES`` (VERDICT r04 next-round item 5).

    Layout: edges are tagged with ``s_shard = s_id // shard_size`` and
    sorted by it ONCE (the only edge-sized exchange added); rank and
    out-weight state live as per-shard object refs. Per iteration each
    edge task ``ray.get``s ONLY the shards its (contiguous) batch
    touches — O(shard_size) per worker, never O(V) — computes the same
    integer contributions as the flat path, map-side-combines by t_id,
    and the node-sized aggregate is re-assembled into new shard refs by
    STREAMING ``iter_batches`` over a t_id-sorted result, so
    the driver too holds at most one shard at a time. Arithmetic is
    bit-identical to the broadcast path (same per-edge floor division,
    exact integer sums in any order) — property-tested equal.

    Returns the final rank state as the list of per-shard refs."""
    import ray
    from ray.data.aggregate import Sum

    n_shards = (V + shard_size - 1) // shard_size

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["s_shard"] = b["s_id"].to_numpy() // shard_size
        return b

    esh = eint.map_batches(tag, batch_format="pandas").sort("s_shard").materialize()
    w_refs = [ray.put(W_arr[i * shard_size:(i + 1) * shard_size])
              for i in range(n_shards)]
    r_refs = [ray.put(np.full(min(shard_size, V - i * shard_size), SCALE,
                              dtype=np.int64))
              for i in range(n_shards)]

    for _ in range(n_iter):
        cur = list(r_refs)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            sh = b["s_shard"].to_numpy()
            s_all = b["s_id"].to_numpy()
            t_all = b["t_id"].to_numpy()
            w_all = b["w"].to_numpy().astype(np.int64)
            out_t: list[np.ndarray] = []
            out_c: list[np.ndarray] = []
            for shard in np.unique(sh):
                m = sh == shard
                s = s_all[m] - int(shard) * shard_size
                w = w_all[m]
                r_arr = ray.get(cur[int(shard)])
                W = ray.get(w_refs[int(shard)])
                ru = r_arr[s]
                _guard_mul(ru, w, "textrank contrib (sharded)")
                out_t.append(t_all[m])
                out_c.append((ru * w) // W[s])
            if not out_t:
                return pd.DataFrame({"t_id": pd.Series([], dtype=np.int64),
                                     "c": pd.Series([], dtype=np.int64)})
            df = pd.DataFrame({"t_id": np.concatenate(out_t),
                               "c": np.concatenate(out_c)})
            # map-side combine (exact integer sums, order-free)
            return df.groupby("t_id", sort=False, as_index=False)["c"].sum()

        agg = (esh.map_batches(contrib, batch_format="pandas")
               .groupby("t_id").aggregate(Sum("c", alias_name="sc"))
               .sort("t_id"))
        # streaming shard re-assembly: ≤1 shard in driver memory
        new_refs: list = []
        buf = np.full(min(shard_size, V), _BASE, dtype=np.int64)
        cur_shard = 0

        def flush_to(upto: int):
            nonlocal cur_shard, buf
            while cur_shard < upto:
                new_refs.append(ray.put(buf))
                cur_shard += 1
                size = min(shard_size, V - cur_shard * shard_size)
                buf = np.full(max(size, 0), _BASE, dtype=np.int64)

        for bt in agg.iter_batches(batch_format="pandas"):
            t = bt["t_id"].to_numpy().astype(np.int64)
            sc = bt["sc"].to_numpy().astype(np.int64)
            _guard_mul(np.array([_D_NUM]), sc, "textrank damped update")
            shards = t // shard_size
            for shard in np.unique(shards):
                flush_to(int(shard))
                m = shards == shard
                buf[t[m] - int(shard) * shard_size] = (
                    _BASE + (_D_NUM * sc[m]) // _D_DEN)
        flush_to(n_shards)
        r_refs = new_refs
    return r_refs


def textrank_keywords(transcripts_ds, n_iter: int = 4, top_n: int = 20,
                      cfg: AnalyzerConfig | None = None,
                      shard_size: int | None = None) -> pd.DataFrame:
    """Top-``top_n`` terms by integer PageRank after ``n_iter`` damped
    iterations; returns (term, rank) ordered by (rank desc, term).

    Rank state is a per-iteration broadcast numpy array up to
    ``SHARD_AT_NODES`` nodes; past that (or when ``shard_size`` is
    given explicitly) the sharded path bounds per-worker AND driver
    state to one shard (:func:`_textrank_sharded`)."""
    import ray
    from ray.data.aggregate import Sum

    edges = build_adjacency(transcripts_ds, cfg).materialize()
    nodes, W_arr, eint = factorize_edge_graph(edges, symmetric=True)
    V = nodes.size

    if shard_size is None and V > SHARD_AT_NODES:
        shard_size = SHARD_AT_NODES
    if shard_size is not None and V > 0:
        r_refs = _textrank_sharded(eint, W_arr, V, n_iter, shard_size)
        # per-shard top-n partials → tiny driver merge
        parts = []
        for i, ref in enumerate(r_refs):
            r = ray.get(ref)
            if r.size == 0:
                continue
            k = min(top_n, r.size)
            # top-k by the SAME (rank desc, term asc) order the final
            # merge uses: argpartition alone keeps an arbitrary subset
            # of rank-ties at the k-th boundary, which can drop a term
            # the flat path would return (code-review r05). Resolve the
            # boundary ties by term without sorting the shard.
            pos = np.argpartition(-r, k - 1)[:k]
            v = int(r[pos].min())               # k-th largest rank
            strict = np.flatnonzero(r > v)
            need = k - strict.size
            tied = np.flatnonzero(r == v)
            if tied.size > need:
                t_terms = nodes[i * shard_size + tied]
                tied = tied[np.argpartition(t_terms, need - 1)[:need]]
                tied = tied[np.argsort(nodes[i * shard_size + tied],
                                       kind="stable")]
            pos = np.concatenate([strict, tied])
            parts.append(pd.DataFrame({
                "term": nodes[i * shard_size + pos], "rank": r[pos]}))
        out = pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame({"term": [], "rank": []})
        out["rank"] = out["rank"].astype(np.int64)
        out = out.sort_values(["rank", "term"], ascending=[False, True],
                              kind="mergesort").head(top_n)
        return out.reset_index(drop=True)

    w_ref = ray.put(W_arr)
    r = np.full(V, SCALE, dtype=np.int64)

    for _ in range(n_iter):
        r_ref = ray.put(r)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            r_arr = ray.get(r_ref)
            W = ray.get(w_ref)
            s = b["s_id"].to_numpy()
            w = b["w"].to_numpy().astype(np.int64)
            ru = r_arr[s]
            _guard_mul(ru, w, "textrank contrib")
            return pd.DataFrame({"t_id": b["t_id"], "c": (ru * w) // W[s]})

        new = (
            eint.map_batches(contrib, batch_format="pandas")
            .groupby("t_id")
            .aggregate(Sum("c", alias_name="sc"))
            .to_pandas()
        )
        sc = new["sc"].to_numpy().astype(np.int64)
        _guard_mul(np.array([_D_NUM]), sc, "textrank damped update")
        r = np.full(V, _BASE, dtype=np.int64)
        r[new["t_id"].to_numpy()] = _BASE + (_D_NUM * sc) // _D_DEN

    out = pd.DataFrame({"term": nodes, "rank": r})
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

    Scale shape: identical to TextRank — the directed int-id edge table
    is the only corpus-derived state; scores are node-sized int64 numpy
    broadcasts; each half-iteration is one map over edge blocks + one
    node-sized groupby-sum. int64 overflow is guarded at BOTH widths:
    per-element (``_guard_mul`` on score×w inside each batch) AND on
    the aggregated gather — before each push the driver asserts
    ``max(scores) × max-in-weight-of-the-gather-side`` fits int64 (the
    per-node in-weight maxima are node-sized aggregates computed once
    at setup), since a node's in-flow SUM can wrap even when every
    addend fits. The normalizing multiply then runs in Python-object
    (arbitrary-precision) arithmetic over the node-sized array —
    matching the twin's HUGEINT semantics exactly. Returns the
    top-``top_n`` rows per kind: (kind ∈ {hub, authority}, term, score)."""
    import ray
    from ray.data.aggregate import Sum

    edges = build_adjacency(transcripts_ds, cfg, symmetric=False).materialize()
    nodes, W_out, eint = factorize_edge_graph(edges)
    V = nodes.size

    # max total in-weight per gather side (ADVICE r04: the groupby Sum
    # of in-flow can wrap int64 even when each val·w addend fits)
    win = eint.groupby("t_id").aggregate(Sum("w", alias_name="wi")).to_pandas()
    max_in_t = int(win["wi"].max()) if len(win) else 0
    max_in_s = int(W_out.max()) if W_out.size else 0
    _I64 = (1 << 63) - 1

    a = np.full(V, SCALE, dtype=np.int64)
    h = np.full(V, SCALE, dtype=np.int64)

    def _push(scores: np.ndarray, src_col: str, dst_col: str) -> np.ndarray:
        gather_w = max_in_t if dst_col == "t_id" else max_in_s
        mx_score = int(scores.max()) if scores.size else 0
        if gather_w and mx_score and mx_score > _I64 // gather_w:
            raise OverflowError(
                f"hits aggregated gather would exceed int64: max score "
                f"{mx_score} × max in-weight {gather_w}")
        ref = ray.put(scores)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            sc_arr = ray.get(ref)
            src = b[src_col].to_numpy()
            w = b["w"].to_numpy().astype(np.int64)
            val = sc_arr[src]
            _guard_mul(val, w, "hits gather")
            return pd.DataFrame({"t": b[dst_col], "c": val * w})

        agg = (eint.map_batches(contrib, batch_format="pandas")
               .groupby("t").aggregate(Sum("c", alias_name="sc")).to_pandas())
        out = np.zeros(V, dtype=np.int64)
        out[agg["t"].to_numpy()] = agg["sc"].to_numpy().astype(np.int64)
        mx = int(out.max()) if out.size else 0
        if mx > 0:
            # HUGEINT-equivalent normalize: object-dtype node-sized array
            out = ((out.astype(object) * SCALE) // mx).astype(np.int64)
        return out

    for _ in range(n_iter):
        a = _push(h, "s_id", "t_id")   # authorities gather from hubs
        h = _push(a, "t_id", "s_id")   # hubs gather from authorities

    def _top(scores: np.ndarray, kind: str) -> pd.DataFrame:
        df = pd.DataFrame({"term": nodes, "score": scores})
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
    TextRank/HITS), two node-sized marginal groupbys broadcast as
    aligned int64 arrays, a scoring map over int edge blocks with
    batch-local top-n partials (ids mapped back to terms only for the
    ≤top_n survivors per batch), tiny driver merge. Returns
    (s, t, n_pair, pmi round4) by (pmi desc, s, t)."""
    import ray
    from ray.data.aggregate import Sum

    edges = build_adjacency(transcripts_ds, cfg, symmetric=False).materialize()
    nodes, cl, eint = factorize_edge_graph(edges)
    V = nodes.size

    right = eint.groupby("t_id").aggregate(Sum("w", alias_name="cr")).to_pandas()
    n_total = int(cl.sum())
    cr = np.zeros(V, dtype=np.int64)
    cr[right["t_id"].to_numpy()] = right["cr"].to_numpy().astype(np.int64)
    ref = ray.put({"cl": cl, "cr": cr, "n": n_total, "nodes": nodes})

    def score(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        w = b["w"].to_numpy().astype(np.int64)
        keep = w >= min_count
        if not keep.any():
            return pd.DataFrame({"s": pd.Series([], dtype=object),
                                 "t": pd.Series([], dtype=object),
                                 "n_pair": pd.Series([], dtype=np.int64),
                                 "pmi": pd.Series([], dtype=float)})
        s_id = b["s_id"].to_numpy()[keep]
        t_id = b["t_id"].to_numpy()[keep]
        w = w[keep]
        a = st["cl"][s_id].astype(np.float64)
        c = st["cr"][t_id].astype(np.float64)
        pmi = np.log(st["n"] * w.astype(np.float64) / (a * c))
        pmi = np.sign(pmi) * np.floor(np.abs(pmi) * 1e4 + 0.5) / 1e4
        out = pd.DataFrame({"s": st["nodes"][s_id], "t": st["nodes"][t_id],
                            "n_pair": w, "pmi": pmi})
        return out.sort_values(["pmi", "s", "t"],
                               ascending=[False, True, True],
                               kind="mergesort").head(top_n)

    cand = eint.map_batches(score, batch_format="pandas").to_pandas()
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
    iterations over int edge blocks, frontier-sparse (zero-mass edges
    emit nothing). Returns top-``top_n`` (term, rank), seeds included
    (they dominate by construction)."""
    import ray
    from ray.data.aggregate import Sum

    edges = build_adjacency(transcripts_ds, cfg).materialize()
    nodes, W_arr, eint = factorize_edge_graph(edges, symmetric=True)
    V = nodes.size
    w_ref = ray.put(W_arr)

    seed_pos = np.searchsorted(nodes, np.array(sorted(set(seeds)), dtype=object))
    seed_ids = np.array(
        [p for p, s_ in zip(seed_pos, sorted(set(seeds)))
         if p < V and nodes[p] == s_], dtype=np.int64)
    base = np.zeros(V, dtype=np.int64)
    base[seed_ids] = _BASE
    r = base.copy()

    for _ in range(n_iter):
        r_ref = ray.put(r)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            r_arr = ray.get(r_ref)
            W = ray.get(w_ref)
            s = b["s_id"].to_numpy()
            ru = r_arr[s]
            keep = ru > 0                 # sparse frontier: zero mass emits nothing
            s, ru = s[keep], ru[keep]
            w = b["w"].to_numpy().astype(np.int64)[keep]
            _guard_mul(ru, w, "ppr contrib")
            return pd.DataFrame({"t_id": b["t_id"].to_numpy()[keep],
                                 "c": (ru * w) // W[s]})

        agg = (eint.map_batches(contrib, batch_format="pandas")
               .groupby("t_id").aggregate(Sum("c", alias_name="sc")).to_pandas())
        sc = agg["sc"].to_numpy().astype(np.int64)
        _guard_mul(np.array([_D_NUM]), sc, "ppr damped update")
        r = base.copy()
        r[agg["t_id"].to_numpy()] += (_D_NUM * sc) // _D_DEN

    out = pd.DataFrame({"term": nodes, "rank": r})
    out = out[out["rank"] > 0]
    out["rank"] = out["rank"].astype(np.int64)
    return (out.sort_values(["rank", "term"], ascending=[False, True],
                            kind="mergesort").head(top_n).reset_index(drop=True))


def kn_bigrams(transcripts_ds, discount: float = 0.75, min_count: int = 5,
               top_n: int = 20,
               cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney '95;
    Chen & Goodman '99 — the n-gram smoothing standard):

        P(t|s) = max(c(s,t) − D, 0)/c(s·)
                 + (D · N1+(s·)/c(s·)) · N1+(·t)/N1+(··)

    with absolute discount D, continuation probability from bigram-TYPE
    counts — the lower-order distribution that makes KN the right LM
    for "Francisco"-type words that appear in few contexts. Built on
    the shared directed adjacency (self-bigrams excluded, the edge
    convention PMI/HITS use — documented).

    Scale shape: ONE bigram-vocabulary shuffle (shared edge build +
    int-id factorize), THREE node-sized groupbys (occurrence marginal
    rides the factorize; out-type / in-type counts) broadcast as
    aligned arrays, scoring as a map over int edge blocks with
    batch-local top-n partials. The float expression is written
    identically on both sides (same association order over integer
    inputs → identical IEEE results), then round4 half-away — exact
    twin. Returns (s, t, n_pair, pkn) by (pkn desc, s, t),
    ``n_pair ≥ min_count``."""
    import ray
    from ray.data.aggregate import Count, Sum

    edges = build_adjacency(transcripts_ds, cfg, symmetric=False).materialize()
    nodes, cl, eint = factorize_edge_graph(edges)
    V = nodes.size

    ot_df = eint.groupby("s_id").aggregate(Count(alias_name="k")).to_pandas()
    it_df = eint.groupby("t_id").aggregate(Count(alias_name="k")).to_pandas()
    ot = np.zeros(V, dtype=np.int64)
    ot[ot_df["s_id"].to_numpy()] = ot_df["k"].to_numpy().astype(np.int64)
    it = np.zeros(V, dtype=np.int64)
    it[it_df["t_id"].to_numpy()] = it_df["k"].to_numpy().astype(np.int64)
    total_types = int(ot.sum())
    ref = ray.put({"cl": cl, "ot": ot, "it": it, "nodes": nodes})

    def score(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        w = b["w"].to_numpy().astype(np.int64)
        keep = w >= min_count
        if not keep.any():
            return pd.DataFrame({"s": pd.Series([], dtype=object),
                                 "t": pd.Series([], dtype=object),
                                 "n_pair": pd.Series([], dtype=np.int64),
                                 "pkn": pd.Series([], dtype=float)})
        s_id = b["s_id"].to_numpy()[keep]
        t_id = b["t_id"].to_numpy()[keep]
        w = w[keep]
        cls = st["cl"][s_id].astype(np.float64)
        ots = st["ot"][s_id].astype(np.float64)
        its = st["it"][t_id].astype(np.float64)
        # association order mirrors the SQL expression verbatim
        pkn = (np.maximum(w - discount, 0.0) / cls
               + discount * ots / cls * (its / float(total_types)))
        pkn = np.sign(pkn) * np.floor(np.abs(pkn) * 1e4 + 0.5) / 1e4
        out = pd.DataFrame({"s": st["nodes"][s_id], "t": st["nodes"][t_id],
                            "n_pair": w, "pkn": pkn})
        return out.sort_values(["pkn", "s", "t"],
                               ascending=[False, True, True],
                               kind="mergesort").head(top_n)

    cand = eint.map_batches(score, batch_format="pandas").to_pandas()
    return (cand.sort_values(["pkn", "s", "t"], ascending=[False, True, True],
                             kind="mergesort").head(top_n).reset_index(drop=True))


def kn_perplexity(tagged_ds, discount: float = 0.75,
                  cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Bigram perplexity of the VAL split under the TRAIN-split
    interpolated Kneser-Ney LM — the held-out LM evaluation every
    training pipeline runs. ``tagged_ds`` carries transcripts plus a
    ``split`` column (dataset_split contract).

    Determinism: each val bigram's log-probability is quantized to an
    int64 (×10⁴, DuckDB round() parity) BEFORE summation — the
    nb_classify pattern — so the corpus sum is an integer, independent
    of batch order, and perplexity = exp(−sum/10⁴/N) is one identical
    float op at the end. Bigrams whose left or right term never occurs
    in a train bigram are EXCLUDED and counted as OOV (the interpolated
    form covers unseen PAIRS of seen terms via the continuation term —
    only unseen TERMS need exclusion); self-pairs (s==t) are excluded
    on both splits, the adjacency convention every graph op shares.

    Scale shape: one train-adjacency build + factorize (shared
    machinery), one val-bigram (s,t)-keyed exchange, scoring as a map
    over the val edge blocks against broadcast marginal arrays, scalar
    partials out. Returns one row (n_val_bigrams, n_oov_bigrams,
    sum_lp_x1e4, ppl)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away

    cfg = cfg or AnalyzerConfig()

    def only(split_val: str):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.equal(b["split"], split_val))
        return f

    edges = build_adjacency(tagged_ds.map_batches(only("train"),
                                                  batch_format="pyarrow"),
                            cfg, symmetric=False).materialize()
    nodes, cl, eint = factorize_edge_graph(edges)
    V = nodes.size
    ot_df = eint.groupby("s_id").aggregate(Count(alias_name="k")).to_pandas()
    it_df = eint.groupby("t_id").aggregate(Count(alias_name="k")).to_pandas()
    ot = np.zeros(V, dtype=np.int64)
    ot[ot_df["s_id"].to_numpy()] = ot_df["k"].to_numpy().astype(np.int64)
    it = np.zeros(V, dtype=np.int64)
    it[it_df["t_id"].to_numpy()] = it_df["k"].to_numpy().astype(np.int64)
    total_types = int(ot.sum())

    # train pair weights ride the scoring join as a third marginal-like
    # input: shuffle val bigram counts UNIONed with train edges on (s,t)
    val_edges = build_adjacency(tagged_ds.map_batches(only("val"),
                                                      batch_format="pyarrow"),
                                cfg, symmetric=False)

    def tag_train(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": b["s"], "t": b["t"],
                             "w_tr": b["w"].astype(np.int64),
                             "w_va": np.zeros(len(b), np.int64)})

    def tag_val(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": b["s"], "t": b["t"],
                             "w_tr": np.zeros(len(b), np.int64),
                             "w_va": b["w"].astype(np.int64)})

    merged = (edges.map_batches(tag_train, batch_format="pandas")
              .union(val_edges.map_batches(tag_val, batch_format="pandas"))
              .groupby(["s", "t"])
              .aggregate(Sum("w_tr", alias_name="w"),
                         Sum("w_va", alias_name="v")))

    ref = ray.put({"cl": cl, "ot": ot, "it": it, "nodes": nodes})

    def score(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        v = b["v"].to_numpy().astype(np.int64)
        keep = v > 0
        if not keep.any():
            return pd.DataFrame({"n_p": [np.int64(0)], "oov_p": [np.int64(0)],
                                 "lp_p": [np.int64(0)]})
        idx = pd.Index(st["nodes"])
        s_id = idx.get_indexer(b["s"].to_numpy()[keep])
        t_id = idx.get_indexer(b["t"].to_numpy()[keep])
        v = v[keep]
        w = b["w"].to_numpy().astype(np.int64)[keep]
        seen = (s_id >= 0) & (t_id >= 0)
        seen &= np.where(seen, st["cl"][np.maximum(s_id, 0)] > 0, False)
        seen &= np.where(seen, st["it"][np.maximum(t_id, 0)] > 0, False)
        n_oov = int(v[~seen].sum())
        s_id, t_id, v, w = s_id[seen], t_id[seen], v[seen], w[seen]
        if v.size == 0:
            return pd.DataFrame({"n_p": [np.int64(0)],
                                 "oov_p": [np.int64(n_oov)],
                                 "lp_p": [np.int64(0)]})
        cls = st["cl"][s_id].astype(np.float64)
        ots = st["ot"][s_id].astype(np.float64)
        its = st["it"][t_id].astype(np.float64)
        pkn = (np.maximum(w - discount, 0.0) / cls
               + discount * ots / cls * (its / float(total_types)))
        lp = round_half_away(np.log(pkn) * 1e4, 0).astype(np.int64)
        return pd.DataFrame({"n_p": [np.int64(v.sum())],
                             "oov_p": [np.int64(n_oov)],
                             "lp_p": [np.int64((v * lp).sum())]})

    tot = merged.map_batches(score, batch_format="pandas").to_pandas()
    n_big = int(tot["n_p"].sum())
    n_oov = int(tot["oov_p"].sum())
    s_lp = int(tot["lp_p"].sum())
    ppl = 0.0 if n_big == 0 else float(
        round_half_away(np.array([np.exp(-(s_lp / 1e4) / n_big)]) * 1e4,
                        0)[0] / 1e4)
    return pd.DataFrame({"n_val_bigrams": [np.int64(n_big)],
                         "n_oov_bigrams": [np.int64(n_oov)],
                         "sum_lp_x1e4": [np.int64(s_lp)],
                         "ppl": [ppl]})
