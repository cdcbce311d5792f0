"""Duplicate-cluster assignment: distributed connected components over a
candidate-pair edge set, then a streaming cluster-id attach on the corpus.

The training-data use: near-dup detectors (exact hash groups, MinHash-LSH,
SimHash, embedding cosine) emit PAIRS; curation needs per-document CLUSTER
ids so exactly one canonical document per duplicate family survives. The
missing step is connected components — pairs (1,2) and (2,3) must place
1, 2, 3 in one family even though (1,3) was never emitted.

Algorithm: alternating Large-Star / Small-Star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC 2014). Each round is ONE ``groupby(node).map_groups`` over
the edge set — no joins, no driver-side union-find, converges in
O(log² n) rounds (dup-cluster graphs: a handful). Per-round state is the
edge set itself, which is candidate-pair-sized (≪ corpus; LSH emits only
same-bucket pairs), so the per-round ``materialize()`` holds pairs, never
documents — the corpus itself streams through exactly one ``map_batches``
at the end.

Scale notes (100 TB):
* The edge set shuffles by node each round — candidate pairs, not corpus.
* ``assign_clusters`` broadcasts the (node → root) map via ``ray.put``
  once; valid while clustered-node count ≪ corpus (true for dup families).
  For adversarially duplicate-heavy corpora, swap the broadcast for a
  hash-join on doc_id against the persisted component table.
* Convergence is detected by an exact (count, xor-hash) signature of the
  canonical edge set — two tiny driver scalars per round, not a data pull.

Reference parity: the reference deduplicates exact-match candidates only
(no transitive grouping); this operator is one of the beyond-reference
training-data additions (SURVEY.md §6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

def _mix_edges(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Non-linear 64-bit per-edge hash (splitmix64 finalizer). A linear
    hash (e.g. (a*M) ^ b) is separable — two edges swapping their 'a'
    endpoints XOR/sum-cancel — which made an early convergence check
    fire one round too soon on a real graph."""
    x = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(np.uint64) * np.uint64(
        0xC2B2AE3D27D4EB4F
    )
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _bidir(batch: pa.Table) -> pa.Table:
    """Canonical (a<b) edges → both directed orientations for grouping."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        }
    )


_EMPTY_EDGES = pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})


def _large_star(g: pd.DataFrame) -> pd.DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).
    Edges to u's smaller neighbors are (re-)emitted by those neighbors'
    own groups, so connectivity is preserved (paper, Lemma 1)."""
    u = int(g["src"].iloc[0])
    nbrs = np.unique(g["dst"].to_numpy(np.int64))
    m = min(u, int(nbrs[0]))
    out = nbrs[nbrs > u]
    if out.size == 0:
        return _EMPTY_EDGES
    return pd.DataFrame({"a": np.full(out.size, m, np.int64), "b": out})


def _small_star(g: pd.DataFrame) -> pd.DataFrame:
    """Directed large→small edges grouped by the large end u: connect u
    and all its (smaller) neighbors to the minimum neighbor."""
    u = int(g["src"].iloc[0])
    nbrs = np.unique(g["dst"].to_numpy(np.int64))  # all < u (directed form)
    m = int(nbrs[0])
    out = np.append(nbrs[nbrs != m], u)
    return pd.DataFrame({"a": np.full(out.size, m, np.int64), "b": out})


def _dedup_edges(ds):
    """Global edge dedup: groupby both endpoints, keep one row."""
    return ds.groupby(["a", "b"]).map_groups(
        lambda g: g.iloc[:1], batch_format="pandas"
    )


def connected_components(edges_ds, max_rounds: int = 32):
    """Edges Dataset(a int64, b int64; undirected, any orientation,
    self-loops ignored) → Dataset(node, root) star edges: one row per
    non-root node of every component, root = min node id of the component.

    Raises RuntimeError if not converged after ``max_rounds`` alternating
    large/small-star rounds (each round is O(log n) progress; 32 covers
    any graph that fits in a real cluster).
    """

    def _canon(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table({"a": pa.array(lo[keep]), "b": pa.array(hi[keep])})

    edges = _dedup_edges(edges_ds.map_batches(_canon, batch_format="pyarrow")).materialize()
    prev_sig: tuple[int, int] | None = None
    for _ in range(max_rounds):
        # No global dedup inside the loop: np.unique over each group's
        # neighbor list dedups where it matters; cross-group duplicate
        # edges only pad the next shuffle slightly and die next round.
        # Large-Star: group the full (bidirected) neighborhood of each node.
        edges = (
            edges.map_batches(_bidir, batch_format="pyarrow")
            .groupby("src")
            .map_groups(_large_star, batch_format="pandas")
        )
        # Small-Star: group directed large→small edges by the large end.
        edges = (
            edges.map_batches(
                # canonical (a<b) IS the large→small orientation reversed:
                # group by b (the large end), neighbors are the small ends
                lambda t: pa.table({"src": t["b"], "dst": t["a"]}),
                batch_format="pyarrow",
            )
            .groupby("src")
            .map_groups(_small_star, batch_format="pandas")
        ).materialize()
        sig = _distributed_signature(edges)
        if sig == prev_sig:
            return edges.map_batches(
                lambda t: pa.table({"node": t["b"], "root": t["a"]}),
                batch_format="pyarrow",
            )
        prev_sig = sig
    raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")


def _distributed_signature(edges) -> tuple[int, int]:
    def _h(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _mix_edges(a, b)
        x = np.add.reduce(h, dtype=np.uint64) if h.size else np.uint64(0)
        return pa.table(
            {
                "n": pa.array([len(a)], pa.int64()),
                "x": pa.array([int(x.astype(np.int64))], pa.int64()),
            }
        )

    parts = edges.map_batches(_h, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return 0, 0
    tot = np.add.reduce(parts["x"].to_numpy(np.int64).view(np.uint64), dtype=np.uint64)
    return int(parts["n"].sum()), int(tot.astype(np.int64))


def assign_clusters(ds, components, id_col: str = "doc_id", out_col: str = "cluster_id"):
    """Attach ``cluster_id`` (component root; own id for singletons) to a
    corpus Dataset in ONE streaming map_batches. ``components`` is the
    (node, root) Dataset from :func:`connected_components` — broadcast
    once via ``ray.put`` (clustered-node-count-sized, ≪ corpus)."""
    comp_df = components.to_pandas()
    lookup = dict(zip(comp_df["node"].astype(np.int64), comp_df["root"].astype(np.int64)))
    ref = ray.put(lookup)

    class _Assign:
        def __init__(self, lookup_ref):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            lk = self.lookup
            roots = np.fromiter((lk.get(int(i), int(i)) for i in ids), np.int64, len(ids))
            return batch.append_column(out_col, pa.array(roots, pa.int64()))

    return ds.map_batches(
        _Assign, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=4
    )
