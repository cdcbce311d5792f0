"""Mergeable streaming sketches for corpus-scale approximate analytics.

Both follow the partial-aggregation pattern from the Ray guide
("Aggregation at scale"): one sketch per ``map_batches`` task, merged in
a tiny reduce — no corpus-sized shuffle.

* :class:`SpaceSaving` — Metwally et al. 2005, "Efficient computation of
  frequent and top-k elements in data streams": capacity-bounded
  counter table with min-displacement; guarantees count overestimates
  bounded by the minimum counter, exact for sufficiently skewed heads.
* :class:`HyperLogLog` — Flajolet et al. 2007: distinct counting in
  2^p registers, standard bias-corrected estimator (no sparse mode —
  corpus-scale cardinalities don't need it).

Both are deterministic (stable crc32-derived hashing) and mergeable
(the property that makes them distributed-safe).
"""

from __future__ import annotations

import zlib
from collections import Counter

import numpy as np


class SpaceSaving:
    """Top-k frequent items with bounded memory."""

    def __init__(self, capacity: int = 1024):
        self.capacity = capacity
        self.counts: Counter = Counter()
        self.errors: dict = {}

    def add_many(self, items: np.ndarray | list, counts: np.ndarray | None = None) -> "SpaceSaving":
        """Vectorized ingest: pre-aggregate the batch, then one table pass."""
        if counts is None:
            uniq, cnt = np.unique(np.asarray(items, dtype=object), return_counts=True)
        else:
            uniq, cnt = np.asarray(items, dtype=object), np.asarray(counts)
        for item, c in zip(uniq.tolist(), cnt.tolist()):
            self._add(item, int(c))
        return self

    def _add(self, item, c: int) -> None:
        if item in self.counts:
            self.counts[item] += c
        elif len(self.counts) < self.capacity:
            self.counts[item] = c
            self.errors[item] = 0
        else:
            evict, m = min(self.counts.items(), key=lambda kv: (kv[1], str(kv[0])))
            del self.counts[evict]
            self.errors.pop(evict, None)
            self.counts[item] = m + c
            self.errors[item] = m

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Error-bound-preserving merge (standard mergeable SpaceSaving,
        Metwally-style): a key absent from a sketch that has reached
        capacity may have been evicted there with a true count up to
        that sketch's minimum counter — so the absent side contributes
        its minimum counter to BOTH the merged count and the merged
        error. A sketch below capacity never evicted, so its absent keys
        contribute 0 and the 'exact iff max_error == 0' guarantee of
        :meth:`topk` survives merging."""
        out = SpaceSaving(self.capacity)
        m_self = min(self.counts.values()) if len(self.counts) >= self.capacity else 0
        m_other = min(other.counts.values()) if len(other.counts) >= other.capacity else 0
        merged: dict = {}
        errors: dict = {}
        for k in set(self.counts) | set(other.counts):
            c = self.counts.get(k, m_self) + other.counts.get(k, m_other)
            e = (self.errors.get(k, 0) if k in self.counts else m_self) + (
                other.errors.get(k, 0) if k in other.counts else m_other
            )
            merged[k] = c
            errors[k] = e
        # keep the heaviest `capacity` entries
        top = sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))[: self.capacity]
        out.counts = Counter(dict(top))
        out.errors = {k: errors[k] for k, _ in top}
        return out

    def topk(self, k: int) -> list[tuple[object, int, int]]:
        """[(item, est_count, max_error)] — exact iff max_error == 0."""
        top = sorted(self.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k]
        return [(item, c, self.errors.get(item, 0)) for item, c in top]

    def to_rows(self) -> dict:
        items = list(self.counts)
        return {
            "item": [str(i) for i in items],
            "count": [int(self.counts[i]) for i in items],
            "error": [int(self.errors.get(i, 0)) for i in items],
        }


def fmix64(h: np.ndarray) -> np.ndarray:
    """MurmurHash3 64-bit finalizer — decorrelates structured inputs
    (crc32 of sequential strings is NOT uniform enough for HLL)."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


class HyperLogLog:
    """Distinct counting, 2^p registers (p=12 → ~1.6 % standard error)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Ingest 64-bit hashes, vectorized."""
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # top p bits consumed
        # rank = leading zeros of remaining 64-p bits + 1 (capped)
        lz = np.full(h.size, 64 - self.p, dtype=np.uint8)
        nonzero = rest != 0
        if nonzero.any():
            # vectorized count-leading-zeros (binary bit scan)
            y = rest[nonzero].copy()
            bits = np.zeros(y.size, dtype=np.uint8)
            for shift in (32, 16, 8, 4, 2, 1):
                mask = y < (np.uint64(1) << np.uint64(64 - shift))  # top `shift` bits zero
                bits[mask] += shift
                y[mask] = y[mask] << np.uint64(shift)
            lz[nonzero] = bits
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_strings(self, items) -> "HyperLogLog":
        h = np.array(
            [
                (np.uint64(zlib.crc32(s.encode())) << np.uint64(32))
                | np.uint64(zlib.crc32(s.encode()[::-1]) ^ 0xA5A5A5A5)
                for s in items
            ],
            dtype=np.uint64,
        )
        return self.add_hashes(fmix64(h))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting small-range correction
        return float(e)


class QuantileSketch:
    """Mergeable rank/quantile sketch for CONTINUOUS columns — the
    compactor-stack design (Karnin-Lang-Liberty 2016 / Manku et al.
    lineage, public algorithms), with DETERMINISTIC alternating
    compaction offsets instead of coin flips — no RNG anywhere, so a
    FIXED ingestion + merge order reproduces bit-identically (the cost
    is a deterministic-bias bound rather than KLL's randomized one).
    Like any compactor sketch the result DOES depend on batch
    composition and merge order, so values may shift within the rank
    bound across cluster sizes — which is why the driver gate for the
    sketch pipeline is rows-only, not hash-exact.

    Level ``i`` holds items of weight ``2^i``; a level past ``k`` items
    sorts, promotes every other item to level ``i+1`` (offset
    alternating per level), keeping total weight exact by carrying an
    odd leftover in place. Rank error grows O(n·log²(n/k)/k) — with
    k=256 that is well under 1% of n for any realistic n (pytest
    asserts the empirical bound).

    Complements the EXACT path (stages/quantiles.py), which requires
    bounded distinct-value cardinality; this sketch does not.
    """

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = []
        self._parity: list[int] = []
        self.n = 0

    def _ensure(self, i: int) -> None:
        while len(self.levels) <= i:
            self.levels.append(np.empty(0, dtype=np.float64))
            self._parity.append(0)

    def _compact(self, i: int) -> None:
        arr = np.sort(self.levels[i], kind="mergesort")
        if arr.size % 2 == 1:  # carry one item: total weight stays exact
            keep, arr = arr[-1:], arr[:-1]
        else:
            keep = np.empty(0, dtype=np.float64)
        off = self._parity[i]
        self._parity[i] ^= 1
        self.levels[i] = keep
        self._ensure(i + 1)
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], arr[off::2]])
        if self.levels[i + 1].size > self.k:
            self._compact(i + 1)

    def add_many(self, values) -> "QuantileSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += int(v.size)
        self._ensure(0)
        self.levels[0] = np.concatenate([self.levels[0], v])
        if self.levels[0].size > self.k:
            self._compact(0)
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        """Returns a NEW merged sketch; neither operand is mutated
        (matching SpaceSaving.merge / HyperLogLog.merge in this
        module, so the shared tree-reduce path treats all three
        alike)."""
        out = QuantileSketch(self.k)
        out.n = self.n + other.n
        out.levels = [a.copy() for a in self.levels]
        out._parity = list(self._parity)
        for i, arr in enumerate(other.levels):
            if arr.size == 0:
                continue
            out._ensure(i)
            out.levels[i] = np.concatenate([out.levels[i], arr])
            if out.levels[i].size > out.k:
                out._compact(i)
        return out

    def quantile(self, q: float) -> float:
        """Approximate ``quantile_disc``-style value at rank
        max(ceil(q·n)−1, 0) — the rank computed with exact rational
        arithmetic (``Fraction``), because float ``ceil(q*n)`` picks a
        neighboring element whenever q·n is integral but float-rounds
        up (the same gotcha stages/quantiles.py documents)."""
        from fractions import Fraction

        vals = np.concatenate([a for a in self.levels if a.size]) if self.n else np.empty(0)
        if vals.size == 0:
            return float("nan")
        w = np.concatenate(
            [np.full(a.size, 1 << i, dtype=np.int64) for i, a in enumerate(self.levels) if a.size]
        )
        order = np.argsort(vals, kind="mergesort")
        vals, w = vals[order], w[order]
        cum = np.cumsum(w)
        total = int(cum[-1])  # == self.n (compaction is weight-exact)
        fq = Fraction(str(q))
        target = max(-((-fq.numerator * total) // fq.denominator) - 1, 0)
        j = int(np.searchsorted(cum, target + 1, side="left"))
        return float(vals[min(j, vals.size - 1)])
