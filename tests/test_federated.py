"""Federated (delta-index) querying must be score-identical to a single
index built over the concatenated corpus — the exactness property that
makes incremental ingestion free (pipelines/federated.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.pipelines.federated import FederatedReader
from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader

CFG = EngineConfig(num_partitions=4, block_size=16, hot_term_df_ratio=0.3,
                   hot_term_salt_shift=6, analyzer=AnalyzerConfig(mode="simple"))

QUERIES = ["payment transfer", "the", "tok00042 payment", "иванов иван", "zzznothing", "tok00001 tok00007"]


@pytest.fixture(scope="module")
def split_indexes(tmp_path_factory, corpus_dir, ray_session):
    """Full corpus index vs two half-corpus indexes (split at median conv)."""
    import ray.data as rd

    base = tmp_path_factory.mktemp("fed")
    src = pads.dataset(corpus_dir).to_table()
    df = src.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    cut = len(df) // 2
    # split on a conversation boundary so doc-id order stays contiguous
    while cut < len(df) and df["conv_id"][cut] == df["conv_id"][cut - 1]:
        cut += 1
    a, b = df.iloc[:cut], df.iloc[cut:]

    paths = {}
    for name, part_df in (("full", df), ("a", a), ("b", b)):
        d = str(base / f"src_{name}")
        ds = rd.from_arrow(pa.Table.from_pandas(part_df, preserve_index=False))
        idx = str(base / f"idx_{name}")
        build_index(d, idx, CFG, transcripts_ds=ds)
        paths[name] = idx
    return paths


def test_federated_identical_to_merged(split_indexes):
    full = IndexReader(split_indexes["full"])
    fed = FederatedReader([split_indexes["a"], split_indexes["b"]])
    assert fed.n_docs == full.manifest.n_docs
    assert abs(fed.avgdl - full.manifest.avgdl) < 1e-9
    for q in QUERIES:
        for k in (1, 10, 50):
            d1, s1 = full.search_one(q, k)
            d2, s2 = fed.search_one(q, k)
            assert d1.astype(np.int64).tolist() == d2.astype(np.int64).tolist(), (q, k)
            assert np.allclose(s1, s2, atol=1e-9), (q, k)


def test_federated_rejects_mismatched_params(split_indexes, tmp_path, corpus_dir, ray_session):
    import ray.data as rd

    odd_cfg = CFG.with_(k1=0.9)
    idx = str(tmp_path / "odd")
    src = pads.dataset(corpus_dir).to_table()
    build_index(str(tmp_path / "src"), idx, odd_cfg, transcripts_ds=rd.from_arrow(src))
    with pytest.raises(ValueError):
        FederatedReader([split_indexes["a"], idx])


def test_federated_with_empty_docs(tmp_path, ray_session):
    """Docs with no tokens still consume ids: offsets must span the full
    dense range, not just docs-with-tokens (regression for the
    manifest.n_docs offset bug)."""
    import pandas as pd
    import ray.data as rd

    def mk(rows, name):
        ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
        idx = str(tmp_path / name)
        build_index("mem", idx, CFG, transcripts_ds=ds)
        return idx

    base = {"turn_idx": 0, "role": "user", "tool": "", "ts": pd.Timestamp(2026, 1, 1)}
    a_rows = [
        {**base, "conv_id": "conv-a0", "text": "alpha beta"},
        {**base, "conv_id": "conv-a1", "text": "..."},        # tokenless, still gets id 1
        {**base, "conv_id": "conv-a2", "text": "beta gamma"},
    ]
    b_rows = [{**base, "conv_id": "conv-b0", "text": "alpha delta"}]
    fed = FederatedReader([mk(a_rows, "a"), mk(b_rows, "b")])
    docs, scores = fed.search_one("alpha", 10)
    # doc ids: index a spans 0..2 (3 rows incl. empty), so b's doc starts at 3
    assert set(docs.astype(np.int64).tolist()) == {0, 3}


def test_federated_single(split_indexes):
    full = IndexReader(split_indexes["full"])
    fed = FederatedReader([split_indexes["full"]])
    d1, s1 = full.search_one("payment", 10)
    d2, s2 = fed.search_one("payment", 10)
    assert d1.tolist() == d2.tolist()
    assert np.allclose(s1, s2)


def test_multi_index_alias_serves_federated(ray_session, tmp_path, split_indexes):
    """A multi-index alias resolves to a LIST; searching it through the
    FederatedReader equals searching both indexes federated directly."""
    import os

    from hybrid_sanctions_search_engine_ray.state.aliases import resolve_alias, set_alias

    idx_a, idx_b = split_indexes["a"], split_indexes["b"]
    reg = str(tmp_path / "reg")
    set_alias(reg, "all", [idx_a, idx_b])
    got = resolve_alias(reg, "all")
    assert got == [os.path.abspath(idx_a), os.path.abspath(idx_b)]
    r = FederatedReader(got)
    r2 = FederatedReader([idx_a, idx_b])
    d1, s1 = r.search_one("alpha beta", top_k=10)
    d2, s2 = r2.search_one("alpha beta", top_k=10)
    assert np.array_equal(d1, d2) and np.allclose(s1, s2, atol=0)
    # single-dir aliases still resolve to a plain string
    set_alias(reg, "one", idx_a)
    assert resolve_alias(reg, "one") == os.path.abspath(idx_a)
