"""Benchmark decontamination (training-data curation).

Flag / drop corpus documents that share any w-word shingle with a
benchmark (eval-set) document — the standard n-gram-overlap
decontamination step every LLM training-data pipeline runs before
training (GPT-3 appendix-C style 13-gram overlap; ``w`` is a parameter,
small here because the synthetic docs are short).

Scale shape (100 TB): the benchmark side is always tiny (MBs of eval
text), so its DISTINCT shingle set is built once on the driver,
``ray.put`` once, and read by every actor from the local object store —
never re-shipped per batch. The corpus streams through ONE
``map_batches``: no shuffle, no corpus-sized intermediate, output is
contaminated-docs-sized. Membership testing is Arrow ``is_in`` (a C++
hash-set probe over the vectorized shingle column), and shingle
construction is the same window trick as the shingle analyzer —
``binary_join_element_wise`` over w shifted token views.

Tokenization matches the engine's simple mode (lower + NFC +
``[^\\p{L}\\p{N}]+`` split, empties dropped) so the DuckDB oracle can
rebuild the identical shingles with ``regexp_split_to_array`` +
list-comprehension slicing (driver ``decontaminate`` query).

Reference parity: the reference has no decontamination operator — this
is one of the beyond-reference training-data operators the brief asks
for (SURVEY.md §6 'beyond the reference').
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from hybrid_sanctions_search_engine_ray.stages.analyze import _SIMPLE_RE2, _lower_nfc

_EMPTY_HITS = pa.table(
    {"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
)


def word_wgrams(text: pa.Array | pa.ChunkedArray, w: int) -> tuple[np.ndarray, pa.Array]:
    """Vectorized w-word shingles: → (parent_row_idx, 'tok1 tok2 ... tokw').

    Empty tokens are dropped BEFORE windowing (so tokens adjacent across
    stripped separators shingle together — same as the SQL twin's
    ``list_filter`` then slice). Documents with fewer than ``w`` tokens
    emit nothing. Parent indices come out nondecreasing.
    """
    if w < 1:
        raise ValueError("w must be >= 1")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    tokens = pc.split_pattern_regex(_lower_nfc(text), _SIMPLE_RE2)
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens)
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    p = parent.to_numpy(zero_copy_only=False).astype(np.int64)
    if p.size < w:
        return np.empty(0, dtype=np.int64), pa.array([], pa.string())
    # parent is nondecreasing, so a window of w consecutive tokens lies in
    # one document iff its first and last parents match.
    idx = np.flatnonzero(p[: p.size - w + 1] == p[w - 1 :])
    if idx.size == 0:
        return np.empty(0, dtype=np.int64), pa.array([], pa.string())
    if w == 1:
        return p[idx], flat.take(pa.array(idx))
    cols = [flat.take(pa.array(idx + j)) for j in range(w)]
    grams = pc.binary_join_element_wise(*cols, pa.scalar(" ", pa.string()))
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    return p[idx], grams


def bench_shingle_set(bench_texts: list[str], w: int) -> pa.Array:
    """DISTINCT w-shingles of the benchmark texts (the small broadcast side)."""
    _, grams = word_wgrams(pa.array(list(bench_texts), pa.string()), w)
    u = pc.unique(grams)
    return u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u


class _Contaminator:
    """Actor-pool stage: benchmark shingle set fetched ONCE per actor."""

    def __init__(self, bench_ref, w: int, mode: str):
        self.bench = ray.get(bench_ref)
        self.w = w
        self.mode = mode  # "hits" | "clean"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.bench) == 0:
            return _EMPTY_HITS if self.mode == "hits" else batch
        parent, grams = word_wgrams(batch["text"], self.w)
        if self.mode == "clean":
            if len(grams) == 0:
                return batch
            hit_rows = parent[pc.is_in(grams, value_set=self.bench).to_numpy(zero_copy_only=False)]
            keep = np.ones(batch.num_rows, dtype=bool)
            keep[hit_rows] = False
            return batch.filter(pa.array(keep))
        if len(grams) == 0:
            return _EMPTY_HITS
        hit = pc.is_in(grams, value_set=self.bench).to_numpy(zero_copy_only=False)
        if not hit.any():
            return _EMPTY_HITS
        dist = (
            pa.table({"d": pa.array(parent[hit]), "g": grams.filter(pa.array(hit))})
            .group_by(["d", "g"])
            .aggregate([])
        )  # distinct (doc_row, shingle)
        d = dist["d"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(d, return_counts=True)
        doc_ids = batch["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        doc_ids = doc_ids.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[uniq], pa.int64()),
                "n_hits": pa.array(counts.astype(np.int64)),
            }
        )


def contamination_hits(ds, bench_texts: list[str], w: int = 3, concurrency: int = 4):
    """Per contaminated doc: (doc_id, n_hits = DISTINCT benchmark
    shingles it contains). Streaming, shuffle-free; output is
    contaminated-docs-sized. Benchmark docs that are themselves in the
    corpus self-match — by design (they must be removed too)."""
    ref = ray.put(bench_shingle_set(bench_texts, w))
    return ds.map_batches(
        _Contaminator,
        fn_constructor_args=(ref, w, "hits"),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def decontaminate(ds, bench_texts: list[str], w: int = 3, concurrency: int = 4):
    """The corpus minus every contaminated document (one streaming filter)."""
    ref = ray.put(bench_shingle_set(bench_texts, w))
    return ds.map_batches(
        _Contaminator,
        fn_constructor_args=(ref, w, "clean"),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
