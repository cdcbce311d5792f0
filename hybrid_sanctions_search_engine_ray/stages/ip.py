"""ES IP aggregations (``ip_range``, ``ip_prefix``) over DERIVED
deterministic IPv4 addresses.

The test tables carry no IP column, so addresses derive from an integer
key by pure uint32 arithmetic — Knuth's multiplicative hash
``(key * 2654435761) mod 2^32`` — exactly as the geo family derives
coordinates (stages/geo.py). The derivation is part of the operator
contract and is shared verbatim with the SQL twin, so every bucket
assignment is bit-exact.

Reference surface: the ES ``ip_range`` and ``ip_prefix`` aggregations
in the public agg DSL; the reference service is text-only, so this
family belongs to the engine-completeness axis, not reference parity.

Scale shape: both are pure per-batch map work; the shuffle carries only
(bucket, partial-count) rows — buckets, never rows. ``ip_range`` has as
many buckets as configured ranges; ``ip_prefix`` has at most
``2^prefix_len`` (256 at /8, 65536 at /16) — tiny either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_IP_MULT = 2654435761  # Knuth multiplicative constant (public)


def derive_ip(keys: np.ndarray) -> np.ndarray:
    """uint32 IPv4 from an int64 key — one multiply-mod, identical
    op-for-op with the SQL twin."""
    return ((keys.astype(np.int64) * _IP_MULT) % (1 << 32)).astype(np.uint64)


def _dotted(ip: int) -> str:
    return f"{(ip >> 24) & 255}.{(ip >> 16) & 255}.{(ip >> 8) & 255}.{ip & 255}"


def ip_range_agg(ds, key_col: str,
                 ranges: list[tuple[int | None, int | None]]) -> pd.DataFrame:
    """ES ``ip_range``: doc counts per [from, to) address range (from
    inclusive, to exclusive, either end open — the documented ES rule).
    Returns (key, doc_count) with key = "from-to" dotted quads ("*" for
    an open end), one row per configured range in configuration order.
    """
    from ray.data.aggregate import Sum

    los = np.array([(-1 if lo is None else lo) for lo, _ in ranges], dtype=np.int64)
    his = np.array([(1 << 32) if hi is None else hi for _, hi in ranges], dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        ip = derive_ip(b[key_col].to_numpy(zero_copy_only=False)).astype(np.int64)
        ns = [int(((ip >= los[i]) & (ip < his[i])).sum()) for i in range(len(ranges))]
        return pa.table({"ridx": pa.array(np.arange(len(ranges), dtype=np.int64)),
                         "n_p": pa.array(np.array(ns, dtype=np.int64))})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("ridx")
        .aggregate(Sum("n_p", alias_name="doc_count"))
        .to_pandas()
    )
    counts = {int(r.ridx): int(r.doc_count) for r in agg.itertuples()} if not agg.empty else {}
    keys = []
    for lo, hi in ranges:
        keys.append(f"{'*' if lo is None else _dotted(lo)}-"
                    f"{'*' if hi is None else _dotted(hi)}")
    return pd.DataFrame({"key": keys,
                         "doc_count": pd.Series([counts.get(i, 0) for i in range(len(ranges))],
                                                dtype=np.int64)})


def ip_prefix_agg(ds, key_col: str, prefix_len: int = 8,
                  size: int = 10) -> pd.DataFrame:
    """ES ``ip_prefix``: bucket by the top ``prefix_len`` bits of the
    derived address; per bucket the doc count and the dotted network
    address "a.b.c.d/len". Top ``size`` by (doc_count desc, subnet asc)
    — per-batch partial counts, a subnets-sized shuffle."""
    from ray.data.aggregate import Sum

    shift = 32 - prefix_len

    def partial(b: pa.Table) -> pa.Table:
        ip = derive_ip(b[key_col].to_numpy(zero_copy_only=False)).astype(np.int64)
        net = ip >> shift
        u, c = np.unique(net, return_counts=True)
        return pa.table({"net": pa.array(u.astype(np.int64)),
                         "n_p": pa.array(c.astype(np.int64))})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("net")
        .aggregate(Sum("n_p", alias_name="doc_count"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"subnet": pd.Series([], dtype=object),
                             "doc_count": pd.Series([], dtype=np.int64)})
    agg = agg.sort_values(["doc_count", "net"], ascending=[False, True],
                          kind="mergesort").head(size).reset_index(drop=True)
    subnets = [f"{_dotted(int(n) << shift)}/{prefix_len}" for n in agg["net"]]
    return pd.DataFrame({"subnet": subnets,
                         "doc_count": agg["doc_count"].astype(np.int64)})
