"""Relational + window operators added in round 2 session 4:
exact count-distinct, broadcast anti-join, ROLLUP, lag-gap stats,
trailing moving average, interpolated quantiles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.stages.quantiles import grouped_interp_quantiles
from hybrid_sanctions_search_engine_ray.stages.relational import (
    broadcast_anti_join,
    distinct_keys,
    exact_count_distinct,
    rollup,
)
from hybrid_sanctions_search_engine_ray.stages.windows import gap_stats, trailing_mean


def _events_df(n=600, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n),
            "event_type": rng.choice(["a", "b", "c"], n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "value": rng.uniform(0, 100, n).round(3),
        }
    )


def test_exact_count_distinct_matches_pandas():
    df = _events_df()
    got = (
        exact_count_distinct(rd.from_pandas(df).repartition(5), "event_type", "user_id")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("event_type")
        .agg(n_distinct=("user_id", "nunique"), n_rows=("user_id", "size"))
        .reset_index()
    )
    assert got["n_distinct"].tolist() == exp["n_distinct"].tolist()
    assert got["n_rows"].tolist() == exp["n_rows"].tolist()


def test_broadcast_anti_join_and_null_probe():
    big = pa.table({"k": pa.array([1, 2, 3, None, 5], type=pa.int64()), "v": list("abcde")})
    kept = (
        broadcast_anti_join(rd.from_arrow(big), pa.array([2, 5], type=pa.int64()), on="k")
        .to_pandas()
    )
    # NULL probe rows are dropped (SQL NOT IN semantics).
    assert sorted(kept["v"].tolist()) == ["a", "c"]


def test_distinct_keys_distributed():
    df = pd.DataFrame({"k": [1, 2, 2, 3, 3, 3, 1]})
    keys = distinct_keys(rd.from_pandas(df).repartition(4), "k")
    assert sorted(keys.to_pylist()) == [1, 2, 3]


def test_rollup_levels():
    df = pd.DataFrame(
        {
            "a": ["x", "x", "y", "y"],
            "b": ["p", "q", "p", "p"],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    got = rollup(rd.from_pandas(df).repartition(3), ["a", "b"], "v").to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    # 3 fine groups + 2 per-a subtotals + 1 grand total
    assert len(got) == 6
    total = got[(got.a == "ALL") & (got.b == "ALL")]
    assert float(total["sum_value"].iloc[0]) == 10.0 and int(total["n_rows"].iloc[0]) == 4
    xa = got[(got.a == "x") & (got.b == "ALL")]
    assert float(xa["sum_value"].iloc[0]) == 3.0 and int(xa["n_rows"].iloc[0]) == 2
    fine_yp = got[(got.a == "y") & (got.b == "p")]
    assert float(fine_yp["sum_value"].iloc[0]) == 7.0


def test_gap_stats_matches_pandas_and_skips_singletons():
    df = _events_df(200)
    # make one user a singleton
    df = pd.concat(
        [df[df.user_id != 0], df[df.user_id == 0].head(1)], ignore_index=True
    )
    got = gap_stats(rd.from_pandas(df).repartition(4)).to_pandas().set_index("user_id")
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(g) < 2:
            assert uid not in got.index
            continue
        gaps = np.diff(t)
        assert int(got.loc[uid, "n_gaps"]) == gaps.size
        assert int(got.loc[uid, "sum_gap_us"]) == int(gaps.sum())
        assert int(got.loc[uid, "max_gap_us"]) == int(gaps.max())


def test_trailing_mean_matches_pandas_rolling():
    df = _events_df(300)
    got = (
        trailing_mean(rd.from_pandas(df).repartition(4), window_rows=3)
        .to_pandas()
        .set_index("event_id")["mavg"]
    )
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        exp = g["value"].rolling(3, min_periods=1).mean()
        np.testing.assert_allclose(
            got.loc[g["event_id"]].to_numpy(), exp.to_numpy(), rtol=0, atol=1e-12
        )


@pytest.mark.parametrize("qs", [[0.0, 0.25, 0.5, 0.75, 0.9, 1.0]])
def test_interp_quantiles_match_numpy(qs):
    df = _events_df(500)
    got = (
        grouped_interp_quantiles(rd.from_pandas(df).repartition(4), "event_type", "value", qs)
        .to_pandas()
        .set_index(["event_type", "q"])["value"]
    )
    for et, g in df.groupby("event_type"):
        for q in qs:
            exp = np.percentile(g["value"].to_numpy(), q * 100, method="linear")
            assert abs(got.loc[(et, q)] - exp) < 1e-9, (et, q)


def test_global_topn_matches_full_sort():
    from hybrid_sanctions_search_engine_ray.stages.relational import global_topn

    df = _events_df(800)
    got = global_topn(
        rd.from_pandas(df).repartition(6),
        by=[("value", False), ("event_id", True)],
        n=25,
    ).to_pandas()
    exp = df.sort_values(["value", "event_id"], ascending=[False, True]).head(25)
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["value"].tolist() == exp["value"].tolist()


def test_pivot_table_counts_and_gaps(ray_session):
    from hybrid_sanctions_search_engine_ray.stages.relational import pivot_table

    df = pd.DataFrame({"k": ["a", "a", "b", "a"], "col": [0, 2, 1, 0]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = pivot_table(ds, "k", lambda b: b["col"].to_numpy(zero_copy_only=False),
                      ["x", "y", "z"], prefix="p")
    assert list(out.columns) == ["k", "p_x", "p_y", "p_z"]
    a = out[out["k"] == "a"].iloc[0]
    assert a[["p_x", "p_y", "p_z"]].tolist() == [2, 0, 1]  # absent cell is 0
    b = out[out["k"] == "b"].iloc[0]
    assert b[["p_x", "p_y", "p_z"]].tolist() == [0, 1, 0]
