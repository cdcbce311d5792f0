"""ES ip_range / ip_prefix aggregations (stages/ip.py) vs brute-force
numpy on small in-memory Datasets."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hybrid_sanctions_search_engine_ray.stages.ip import (
    derive_ip,
    ip_prefix_agg,
    ip_range_agg,
)


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df)


@pytest.fixture(scope="module")
def keys_df(ray_session):
    return pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})


def test_derive_ip_is_uint32(keys_df):
    ip = derive_ip(keys_df.k.to_numpy())
    assert ip.max() < (1 << 32) and ip.min() >= 0
    # multiplicative hash is a bijection mod 2^32 (odd multiplier)
    assert len(np.unique(ip)) == len(ip)


def test_ip_range_counts_and_open_ends(keys_df):
    ranges = [(None, 1 << 30), (1 << 30, 3 << 30), (3 << 30, None)]
    out = ip_range_agg(_ds(keys_df), "k", ranges)
    ip = derive_ip(keys_df.k.to_numpy()).astype(np.int64)
    exp = [int(((ip >= (-1 if lo is None else lo))
                & (ip < ((1 << 32) if hi is None else hi))).sum())
           for lo, hi in ranges]
    assert list(out.doc_count) == exp
    assert sum(exp) == len(keys_df)  # ranges tile the space
    assert out.key[0].startswith("*-") and out.key[2].endswith("-*")


def test_ip_prefix_top_and_keys(keys_df):
    out = ip_prefix_agg(_ds(keys_df), "k", prefix_len=8, size=5)
    ip = derive_ip(keys_df.k.to_numpy()).astype(np.int64)
    net, c = np.unique(ip >> 24, return_counts=True)
    order = np.lexsort((net, -c))[:5]
    assert list(out.doc_count) == c[order].tolist()
    assert list(out.subnet) == [f"{int(n)}.0.0.0/8" for n in net[order]]


def test_ip_prefix_16_dotted(ray_session):
    df = pd.DataFrame({"k": np.array([7], dtype=np.int64)})
    out = ip_prefix_agg(_ds(df), "k", prefix_len=16, size=3)
    ip = int(derive_ip(np.array([7]))[0])
    assert list(out.subnet) == [f"{(ip >> 24) & 255}.{(ip >> 16) & 255}.0.0/16"]
    assert list(out.doc_count) == [1]
