"""Deterministic sampling operators for training-data pipelines.

Sampling at 100-TB scale must be (a) a pure per-batch filter — no
shuffle, no coordination, no RNG state — and (b) reproducible across
runs/retries/resumes. Hash sampling gives both: a row is kept iff
``bucket(md5(key || salt)) < rate``, so membership is a property of the
row itself. Changing ``salt`` draws an independent sample; the same
salt always reproduces the same subset (and a task retry re-selects
exactly the same rows — the resume property every other stage relies
on).

Parity: the 64-bit bucket is the little-endian first 8 md5 bytes —
exactly DuckDB's ``md5_number_upper(text)`` — so samples are
SQL-checkable (the driver oracle gate). The per-row ``hashlib`` loop is
the price of that oracle parity (same tradeoff as
``stages/dedup.add_md5``); swap in ``functions/hashing``'s vectorized
path when parity is not needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _bucket100(keys: list, salt: str) -> np.ndarray:
    """Per-key bucket in [0, 100): md5_number_upper(str(key)+salt) % 100."""
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        d = hashlib.md5((str(k) + salt).encode("utf-8")).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return out % np.uint64(100)


def hash_sample(ds, key: str, rate_pct: int, salt: str = ""):
    """Keep ~``rate_pct``% of rows, deterministically by ``key``.

    Pure map_batches filter — streams, no shuffle, reproducible.
    Rows with equal keys are kept or dropped together (useful for
    sampling whole conversations/users by their id).
    """
    if not 0 <= rate_pct <= 100:
        raise ValueError("rate_pct must be in [0, 100]")

    def f(b: pa.Table) -> pa.Table:
        keep = _bucket100(b[key].to_pylist(), salt) < rate_pct
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_hash_sample(ds, key: str, strata: str, rates: dict, salt: str = "",
                           default_pct: int = 0):
    """Per-stratum deterministic sampling: row kept iff its key bucket
    < ``rates[row[strata]]`` (``default_pct`` for unlisted strata).
    The standard rebalancing move (downsample the dominant language /
    source / quality tier) as one streaming filter — no shuffle."""
    for v in rates.values():
        if not 0 <= v <= 100:
            raise ValueError("rates must be in [0, 100]")

    def f(b: pa.Table) -> pa.Table:
        bucket = _bucket100(b[key].to_pylist(), salt)
        svals = b[strata].to_pylist()
        cut = np.fromiter((rates.get(s, default_pct) for s in svals), dtype=np.uint64,
                          count=len(svals))
        return b.filter(pa.array(bucket < cut))

    return ds.map_batches(f, batch_format="pyarrow")
