"""Deterministic hash sampling (stages/sampling.py) and hopping-window
key emission (stages/windows.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.stages.sampling import (
    _bucket100,
    hash_sample,
    stratified_hash_sample,
)
from hybrid_sanctions_search_engine_ray.stages.windows import hopping_window_keys


def test_bucket100_duckdb_parity():
    import duckdb

    keys = ["0", "1", "42x", "conv-00000007", "99999"]
    got = _bucket100(keys, "")
    want = [
        duckdb.sql(f"SELECT md5_number_upper('{k}') % 100").fetchone()[0] for k in keys
    ]
    assert got.tolist() == [int(w) for w in want]


def test_hash_sample_deterministic_and_bounded(ray_session):
    df = pd.DataFrame({"id": np.arange(10_000)})
    a = hash_sample(rd.from_pandas(df).repartition(4), key="id", rate_pct=10).to_pandas()
    b = hash_sample(rd.from_pandas(df).repartition(7), key="id", rate_pct=10).to_pandas()
    # deterministic: identical subset regardless of partitioning
    assert sorted(a["id"]) == sorted(b["id"])
    # roughly 10% (binomial tolerance)
    assert 800 < len(a) < 1200
    # monotone: a 5% sample is a subset of the 10% sample (same salt)
    c = hash_sample(rd.from_pandas(df), key="id", rate_pct=5).to_pandas()
    assert set(c["id"]) <= set(a["id"])
    # different salt → different draw
    d = hash_sample(rd.from_pandas(df), key="id", rate_pct=10, salt="x").to_pandas()
    assert sorted(d["id"]) != sorted(a["id"])


def test_hash_sample_rate_bounds(ray_session):
    df = pd.DataFrame({"id": np.arange(100)})
    assert len(hash_sample(rd.from_pandas(df), "id", 0).to_pandas()) == 0
    assert len(hash_sample(rd.from_pandas(df), "id", 100).to_pandas()) == 100
    with pytest.raises(ValueError):
        hash_sample(rd.from_pandas(df), "id", 101)


def test_stratified_rates(ray_session):
    df = pd.DataFrame({"id": np.arange(6000), "s": ["a", "b", "c"] * 2000})
    got = stratified_hash_sample(
        rd.from_pandas(df), key="id", strata="s", rates={"a": 100, "b": 0}, default_pct=50
    ).to_pandas()
    assert (got["s"] == "a").sum() == 2000   # keep all
    assert (got["s"] == "b").sum() == 0      # drop all
    assert 800 < (got["s"] == "c").sum() < 1200  # default 50%


def test_hopping_window_keys_exact_membership():
    # t = 3700s → grid base 3600; windows starting 3600, 2700, 1800, 900
    ts_us = np.array([3700 * 1_000_000], dtype=np.int64)
    rows, starts = hopping_window_keys(ts_us, window_s=3600, hop_s=900)
    assert rows.tolist() == [0, 0, 0, 0]
    assert sorted(starts.tolist()) == [900, 1800, 2700, 3600]
    # every window [s, s+3600) actually contains t
    assert all(s <= 3700 < s + 3600 for s in starts)


def test_hopping_window_keys_vector_shape():
    ts_us = (np.arange(10, dtype=np.int64) * 1234 + 7) * 1_000_000
    rows, starts = hopping_window_keys(ts_us, window_s=1000, hop_s=250)
    assert rows.size == starts.size == 40
    t_s = ts_us // 1_000_000
    for r, s in zip(rows, starts):
        assert s <= t_s[r] < s + 1000
    with pytest.raises(ValueError):
        hopping_window_keys(ts_us, window_s=1000, hop_s=300)


def test_inverse_sqrt_rates_formula():
    from hybrid_sanctions_search_engine_ray.stages.sampling import inverse_sqrt_rates

    rates = inverse_sqrt_rates({"a": 100, "b": 400, "c": 10000})
    # rarest keeps 100%; 4x larger -> ceil(50); 100x larger -> ceil(10)
    assert rates == {"a": 100, "b": 50, "c": 10}
    assert inverse_sqrt_rates({}) == {}
    # a single stratum keeps everything
    assert inverse_sqrt_rates({"only": 7}) == {"only": 100}


def test_temperature_mix_counts(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.sampling import (
        _bucket100,
        inverse_sqrt_rates,
        temperature_mix,
    )

    df = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64),
        "source": ["rare"] * 20 + ["big"] * 480,
    })
    out = temperature_mix(rd.from_pandas(df), "doc_id", "source", salt="-t")
    got = out.set_index("source")
    rates = inverse_sqrt_rates({"rare": 20, "big": 480})
    assert got.loc["rare", "rate_pct"] == rates["rare"] == 100
    assert got.loc["big", "rate_pct"] == rates["big"]
    assert got.loc["rare", "n_sampled"] == 20      # 100% of the rare stratum
    # brute-force the hash membership for the big stratum
    big_ids = df.loc[df.source == "big", "doc_id"].tolist()
    want = int((_bucket100(big_ids, "-t") < rates["big"]).sum())
    assert got.loc["big", "n_sampled"] == want


def test_dataset_split_deterministic_and_complete(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.sampling import _bucket100, dataset_split

    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64)})
    out = dataset_split(rd.from_pandas(df), "doc_id", {"train": 90, "val": 5, "test": 5},
                        salt="-x").to_pandas()
    assert len(out) == 300 and set(out["split"]) <= {"train", "val", "test"}
    # brute-force the interval rule: sorted names [test, train, val],
    # cumulative edges [5, 95, 100]
    b = _bucket100(df["doc_id"].tolist(), "-x")
    want = np.where(b < 5, "test", np.where(b < 95, "train", "val"))
    assert (out.sort_values("doc_id")["split"].to_numpy() == want).all()
    # same key + salt -> same split on a rerun (retry/resume contract)
    again = dataset_split(rd.from_pandas(df), "doc_id", {"train": 90, "val": 5, "test": 5},
                          salt="-x").to_pandas()
    assert (again.sort_values("doc_id")["split"].to_numpy() == want).all()
    with pytest.raises(ValueError):
        dataset_split(rd.from_pandas(df), "doc_id", {"train": 90, "val": 5})


def test_weighted_sample_deterministic_and_weight_biased(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.sampling import weighted_sample

    n = 400
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "w": np.where(np.arange(n) < 200, 100.0, 1.0)})
    import pyarrow as pa

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    a = weighted_sample(ds, "doc_id", "w", n=50, salt="-t")
    b = weighted_sample(ds, "doc_id", "w", n=50, salt="-t")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()  # reproducible
    # heavy half (w=100) should dominate the sample overwhelmingly
    heavy = (a["doc_id"] < 200).sum()
    assert heavy >= 45
    # a different salt draws a different sample
    c = weighted_sample(ds, "doc_id", "w", n=50, salt="-other")
    assert c["doc_id"].tolist() != a["doc_id"].tolist()
    import pytest

    bad = pd.DataFrame({"doc_id": [1], "w": [0.0]})
    with pytest.raises(Exception, match="positive"):
        weighted_sample(rd.from_pandas(bad), "doc_id", "w", n=1)


def test_label_centroids_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.embeddings import label_centroids

    rng = np.random.RandomState(5)
    m = rng.randn(60, 4).astype(np.float32)
    labels = np.array([0, 1, 2] * 20, dtype=np.int32)
    tbl = pa.table({"label": pa.array(labels),
                    "embedding": pa.array([list(map(float, r)) for r in m],
                                          pa.list_(pa.float32()))})
    out = label_centroids(rd.from_arrow(tbl), "label", "embedding")
    for lab in (0, 1, 2):
        want = m[labels == lab].astype(np.float64).mean(axis=0)
        got = out[out["label"] == lab].sort_values("dim")["centroid"].to_numpy()
        assert np.allclose(got, np.round(want, 6), atol=1e-6)
        assert (out[out["label"] == lab]["n_vectors"] == 20).all()


# --- sliced_scan -------------------------------------------------------------


def test_sliced_scan_partitions_exhaustively(ray_session):
    from hybrid_sanctions_search_engine_ray.stages.sampling import sliced_scan

    ids = np.arange(500, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = sliced_scan(ds, "doc_id", 4, salt="-sl")
    # disjoint + collectively exhaustive: counts and id-sums partition
    assert int(out["doc_count"].sum()) == 500
    assert int(out["sum_id"].sum()) == int(ids.sum())
    assert sorted(out["slice_id"]) == list(out["slice_id"])
    assert out["min_id"].min() == 0 and out["max_id"].max() == 499
    # deterministic: same salt → identical manifest
    again = sliced_scan(rd.from_pandas(pd.DataFrame({"doc_id": ids})), "doc_id", 4,
                        salt="-sl")
    assert out.values.tolist() == again.values.tolist()


def test_sliced_scan_single_slice_and_validation(ray_session):
    from hybrid_sanctions_search_engine_ray.stages.sampling import sliced_scan

    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64)}))
    out = sliced_scan(ds, "doc_id", 1)
    assert out["doc_count"].tolist() == [10]
    with pytest.raises(ValueError):
        sliced_scan(ds, "doc_id", 0)
