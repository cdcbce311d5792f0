"""Distributed triangle counting over the word-adjacency graph.

The classic MapReduce triangle algorithm (Suri & Vassilvitskii, WWW'11
"Counting Triangles and the Curse of the Last Reducer"): orient every
undirected edge from its lower-(degree, id) endpoint to the higher one,
emit WEDGES (pairs of out-neighbors) per source vertex, and count the
wedges whose closing edge exists. Orientation bounds every vertex's
out-degree by O(√m), so hub vertices cannot produce quadratic wedge
fan-out — the whole point of the algorithm, and the reason it survives
stop-word-degree skew at 100 TB.

Shuffle shape: degrees are one node-sized groupby (broadcast once);
wedge emission and the close check are each ONE coarse-bucket exchange
(``crc32 % 256`` keys, the chatprep coarsening — thousands of vertices
/ key pairs per group, vectorized kernels inside, no per-vertex or
per-pair Ray group). The close check is a bucketed hash semi-join of
(v, w) wedge counts against edge markers. Everything is integer/string
— no float enters, so the result is batching/retry/cluster-size
invariant and exactly SQL-twinnable (the canonical a<b<c three-way
self-join).

Reference analog: none (graph analytics is out of the reference's
scope); third member of the iterative/graph family beside connected
components (stages/clusters.py) and TextRank (stages/textrank.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.functions.hashing import (
    factorize_exact,
    hash_string_array,
)
from hybrid_sanctions_search_engine_ray.stages.textrank import build_adjacency

_NB = 256  # coarse shuffle buckets


def triangle_stats(transcripts_ds, cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """(n_nodes, n_edges, n_wedges, n_triangles, clustering) of the
    corpus word-adjacency graph (distinct co-occurring term pairs;
    weights ignored — a triangle is three mutually adjacent terms).
    ``clustering`` is the global coefficient 3·triangles / wedges,
    round-half-away to 4 decimals (the repo's SQL-round convention)."""
    import ray
    from ray.data.aggregate import Sum

    # symmetric (s,t,w) adjacency → distinct undirected edges s < t
    adj = build_adjacency(transcripts_ds, cfg)
    # adj is edge-sized and consumed TWICE (edges + degrees): without
    # this materialize the full corpus tokenize + edge shuffle re-ran
    # for the degree pass (code-review r05 finding)
    adj = adj.materialize()
    edges = adj.map_batches(
        lambda b: b.filter(pc.less(b["s"], b["t"])).select(["s", "t"]),
        batch_format="pyarrow").materialize()

    # node degrees (node-sized; broadcast once). The symmetric table has
    # each undirected edge twice, so rows per s = degree(s).
    deg_df = (
        adj.map_batches(
            lambda b: pa.table({"s": b["s"],
                                "one": pa.array(np.ones(len(b), np.int64))}),
            batch_format="pyarrow")
        .groupby("s").aggregate(Sum("one", alias_name="deg")).to_pandas()
    )
    # Factorized degree state: sorted node array + aligned int64 degree
    # array broadcast ONCE (zero-copy numpy through the object store; no
    # vocab-sized Python dict, no per-edge Python lookup loop — the
    # round-4 graph-state contract shared with stages/textrank.py).
    order = np.argsort(deg_df["s"].to_numpy(dtype=object), kind="mergesort")
    node_arr = deg_df["s"].to_numpy(dtype=object)[order]
    deg_arr = deg_df["deg"].to_numpy(np.int64)[order]
    state_ref = ray.put((node_arr, deg_arr))
    n_nodes = node_arr.size
    n_wedges = int((deg_arr * (deg_arr - 1) // 2).sum())

    class _Orient:
        """low-(deg, term) endpoint → high; bucket by src for the wedge
        exchange. Hash index over the node array built once per actor."""

        def __init__(self, ref):
            nodes, degs = ray.get(ref)
            self.idx = pd.Index(nodes)
            self.degs = degs

        def __call__(self, b: pa.Table) -> pa.Table:
            s = b["s"].to_numpy(zero_copy_only=False)
            t = b["t"].to_numpy(zero_copy_only=False)
            ds_ = self.degs[self.idx.get_indexer(s)]
            dt_ = self.degs[self.idx.get_indexer(t)]
            s_first = ds_ <= dt_          # tie → term order, and s < t holds
            src = np.where(s_first, s, t)
            dst = np.where(s_first, t, s)
            bk = hash_string_array(pa.array(src, pa.string())).astype(np.int64) % _NB
            return pa.table({"src": pa.array(src, pa.string()),
                             "dst": pa.array(dst, pa.string()),
                             "bucket": pa.array(bk, pa.int64())})

    oriented = edges.map_batches(_Orient, fn_constructor_args=(state_ref,),
                                 batch_format="pyarrow", concurrency=2)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        """All out-neighbor pairs, per source run (O(√m) out-degrees)."""
        src = g["src"].to_numpy(dtype=object)
        dst = g["dst"].to_numpy(dtype=object)
        codes, _ = factorize_exact(src)
        order = np.lexsort((dst, codes))
        c, nb = codes[order], dst[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        off = np.r_[starts, c.size]
        vs, ws = [], []
        for a, b in zip(off[:-1], off[1:]):
            k = b - a
            if k >= 2:
                ii, jj = np.triu_indices(k, 1)
                vs.append(nb[a + ii])
                ws.append(nb[a + jj])
        if not vs:
            return pd.DataFrame({"v": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype=np.int64)})
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        # map-side combine: same wedge pair can repeat across sources
        t = pa.table({"v": pa.array(v, pa.string()), "w": pa.array(w, pa.string())})
        gb = t.group_by(["v", "w"]).aggregate([([], "count_all")])
        return pd.DataFrame({"v": gb["v"].to_numpy(zero_copy_only=False),
                             "w": gb["w"].to_numpy(zero_copy_only=False),
                             "c": gb["count_all"].to_numpy().astype(np.int64)})

    def keyed(b: pa.Table, kind_edge: bool) -> pa.Table:
        key = pc.binary_join_element_wise(b["v" if not kind_edge else "s"],
                                          b["w" if not kind_edge else "t"], "\x1f")
        bk = hash_string_array(key).astype(np.int64) % _NB
        return pa.table({
            "v": b["v"] if not kind_edge else b["s"],
            "w": b["w"] if not kind_edge else b["t"],
            "c": b["c"] if not kind_edge else pa.array(np.zeros(len(b), np.int64)),
            "is_edge": pa.array(np.full(len(b), kind_edge)),
            "kbucket": pa.array(bk, pa.int64()),
        })

    wedge_rows = (
        oriented.groupby("bucket")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(lambda b: keyed(b, False), batch_format="pyarrow")
    )
    marker_rows = edges.map_batches(lambda b: keyed(b, True), batch_format="pyarrow")

    def close(g: pd.DataFrame) -> pd.DataFrame:
        """Bucketed hash semi-join: wedge counts whose (v,w) has an edge."""
        we = g[~g["is_edge"].to_numpy()]
        ed = g[g["is_edge"].to_numpy()][["v", "w"]]
        if len(we) == 0 or len(ed) == 0:
            return pd.DataFrame({"tri": [0]})
        m = we.merge(ed.drop_duplicates(), on=["v", "w"], how="inner")
        return pd.DataFrame({"tri": [int(m["c"].sum())]})

    closed = (
        wedge_rows.union(marker_rows)
        .groupby("kbucket")
        .map_groups(close, batch_format="pandas")
        .to_pandas()
    )
    n_tri = int(closed["tri"].sum()) if len(closed) else 0
    n_edges = edges.count()
    clustering = 0.0 if n_wedges == 0 else \
        float(np.floor(3.0 * n_tri / n_wedges * 1e4 + 0.5) / 1e4)
    return pd.DataFrame({
        "n_nodes": [np.int64(n_nodes)],
        "n_edges": [np.int64(n_edges)],
        "n_wedges": [np.int64(n_wedges)],
        "n_triangles": [np.int64(n_tri)],
        "clustering": [clustering],
    })
