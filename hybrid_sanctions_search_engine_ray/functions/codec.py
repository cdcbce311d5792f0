"""Posting-list codec: delta + varint compression, numpy-vectorized.

The reference delegates posting storage to Elasticsearch/Lucene segment
internals (opaque); this is our from-scratch equivalent for Arrow-native
segments (SURVEY.md §1.1 "Posting list / index" row): a posting for one
term is three parallel arrays — sorted ``doc_ids`` (stored as varint
deltas), ``tfs`` and ``doclens`` (plain varints; storing doclen inline
lets the scorer compute BM25 without a doc-length side table).

LEB128-style varint: 7 payload bits per byte, high bit = continuation.
Encode and decode are fully vectorized (no per-value Python loop): byte
counts via threshold comparisons, placement via fancy indexing, decode
via ``np.add.reduceat`` over per-value byte groups.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [1 << (7 * k) for k in range(1, 10)]  # values needing > k bytes


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as concatenated LEB128 varints."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= np.uint64(t)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode concatenated LEB128 varints into a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    # group id for every byte = number of terminators strictly before it
    group_starts = np.empty(b.size, dtype=bool)
    group_starts[0] = True
    group_starts[1:] = is_end[:-1]
    starts_idx = np.flatnonzero(group_starts)
    # shift (in 7-bit units) of each byte within its group
    pos = np.arange(b.size, dtype=np.int64)
    shift = pos - np.repeat(starts_idx, np.diff(np.append(starts_idx, b.size)))
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * shift.astype(np.uint64))
    return np.add.reduceat(contrib, starts_idx)


def encode_posting(doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray) -> tuple[bytes, bytes, bytes]:
    """doc_ids must be sorted ascending & unique. Returns (docs, tfs, dls) buffers."""
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    deltas = np.empty_like(d)
    if d.size:
        deltas[0] = d[0]
        np.subtract(d[1:], d[:-1], out=deltas[1:])
    return (
        varint_encode(deltas),
        varint_encode(np.ascontiguousarray(tfs, dtype=np.uint64)),
        varint_encode(np.ascontiguousarray(doclens, dtype=np.uint64)),
    )


def decode_posting(docs_buf: bytes, tfs_buf: bytes, dls_buf: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_posting`. Returns (doc_ids, tfs, doclens)."""
    deltas = varint_decode(docs_buf)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    return doc_ids, varint_decode(tfs_buf), varint_decode(dls_buf)


def encode_positions(flat_positions: np.ndarray, counts: np.ndarray) -> bytes:
    """Encode per-doc token positions for a posting run.

    ``flat_positions`` is the concatenation of each doc's ascending
    position list (doc order == posting row order); ``counts`` gives the
    positions per doc (== tf, so no extra length table is stored).
    Positions are delta-encoded WITHIN each doc (resets at doc starts),
    then varint-packed — same vectorized shape as the doc-id codec.
    """
    p = np.ascontiguousarray(flat_positions, dtype=np.uint64)
    if p.size == 0:
        return b""
    c = np.ascontiguousarray(counts, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(c)[:-1]))
    deltas = p.copy()
    deltas[1:] -= p[:-1]
    deltas[starts] = p[starts]  # reset at each doc boundary
    return varint_encode(deltas)


def decode_positions(buf: bytes, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_positions`: returns ``(flat_positions,
    offsets)`` where doc ``i``'s positions are
    ``flat[offsets[i]:offsets[i+1]]`` (segmented-cumsum decode, no
    per-doc Python loop)."""
    vals = varint_decode(buf)
    c = np.ascontiguousarray(counts, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(c)))
    if vals.size == 0:
        return vals, offsets
    total = np.cumsum(vals, dtype=np.uint64)
    starts = offsets[:-1]
    base = total[starts] - vals[starts]  # cumulative carry-in of each doc
    flat = total - np.repeat(base, c)
    return flat, offsets


def block_maxes(tfs: np.ndarray, doclens: np.ndarray, k1: float, b: float, avgdl: float, block_size: int) -> np.ndarray:
    """Per-block max of the idf-independent BM25 factor
    ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` — multiplied by the term's
    idf at query time this upper-bounds any doc's contribution in the
    block (block-max pruning; Ding & Suel, "Faster Top-k Document
    Retrieval Using Block-Max Indexes", SIGIR'11).

    Reference form of the kernel the serving path computes inside
    TermPosting (functions/bm25.py) — kept in FLOAT64: a float32
    downcast could round a block max DOWN and let pruning skip a true
    top-k doc, breaking the rank-identical-to-TAAT contract
    (code-review r05 finding)."""
    tf = tfs.astype(np.float64)
    dl = doclens.astype(np.float64)
    f = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    n = f.size
    if n == 0:
        return np.empty(0, dtype=np.float64)
    starts = np.arange(0, n, block_size)
    return np.maximum.reduceat(f, starts)


# --- Elias-Fano (quasi-succinct) doc-id codec -------------------------------
#
# Vigna, "Quasi-succinct indices" (WSDM'13) — the monotone-sequence code
# behind Lucene/PISA doc-id lists: n sorted values in [0, u) take
# n·l + n + (u_max >> l) + 1 bits with l = max(0, floor(log2(u/n))),
# within half a bit of the information-theoretic optimum. Offered beside
# delta+varint as the alternative postings layout; l uses the
# integer-only identity floor(log2(u/n)) = bit_length(u // n) − 1, so
# the size accounting is exactly reproducible in BIGINT SQL.


def ef_split_l(universe: int, n: int) -> int:
    """The Elias-Fano lower-bit width (integer-only, no float log)."""
    if n <= 0:
        raise ValueError("ef_split_l: empty sequence")
    r = universe // n
    return max(0, int(r).bit_length() - 1) if r >= 1 else 0


def ef_encode(doc_ids: np.ndarray, universe: int) -> tuple[bytes, bytes, int]:
    """Encode a sorted ascending uint array from [0, universe) →
    (lower_buf, upper_buf, l). Lower l bits packed LSB-first; upper
    parts gap-unary (bit 1 at position high_i + i). All vectorized
    (packbits), no per-value Python."""
    v = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    n = v.size
    if n == 0:
        raise ValueError("ef_encode: empty sequence")
    if int(v[-1]) >= universe:
        raise ValueError("ef_encode: value outside universe")
    l = ef_split_l(universe, n)
    if l:
        bits = ((v[:, None] >> np.arange(l, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.uint8).ravel()
        lower = np.packbits(bits, bitorder="little").tobytes()
    else:
        lower = b""
    highs = (v >> np.uint64(l)).astype(np.int64)
    ubits = np.zeros(int(n + highs[-1] + 1), dtype=np.uint8)
    ubits[highs + np.arange(n)] = 1
    upper = np.packbits(ubits, bitorder="little").tobytes()
    return lower, upper, l


def ef_decode(lower: bytes, upper: bytes, n: int, l: int) -> np.ndarray:
    """Inverse of :func:`ef_encode` → uint64 array of length n."""
    ubits = np.unpackbits(np.frombuffer(upper, dtype=np.uint8), bitorder="little")
    ones = np.flatnonzero(ubits)[:n]
    highs = (ones - np.arange(n)).astype(np.uint64)
    if l:
        bits = np.unpackbits(np.frombuffer(lower, dtype=np.uint8),
                             bitorder="little")[: n * l].reshape(n, l)
        lows = (bits.astype(np.uint64)
                << np.arange(l, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    else:
        lows = np.zeros(n, dtype=np.uint64)
    return (highs << np.uint64(l)) | lows
