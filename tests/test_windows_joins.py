import numpy as np
import pandas as pd
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.stages.joins import broadcast_join, bucketed_join
from hybrid_sanctions_search_engine_ray.stages.windows import sessionize_group, tumbling_window_key


def test_tumbling_window_key():
    ts = np.array([0, 3_599_999_999, 3_600_000_000, 7_200_000_001], dtype=np.int64)
    assert tumbling_window_key(ts, 3600).tolist() == [0, 0, 3600, 7200]


def test_sessionize_group_gaps():
    us = 1_000_000
    ts = pd.to_datetime([0, 10 * us, 2000 * us, 2010 * us], unit="us")
    g = pd.DataFrame({"user_id": [1] * 4, "ts": ts, "value": [1.0, 2.0, 3.0, 4.0]})
    out = sessionize_group(g, gap_s=1800)
    assert len(out) == 2
    assert out["n_events"].tolist() == [2, 2]
    assert out["sum_value"].tolist() == [3.0, 7.0]


def test_sessionize_exact_gap_boundary():
    # gap exactly == gap_s does NOT start a new session (strict >)
    ts = pd.to_datetime([0, 1800 * 1_000_000], unit="us")
    g = pd.DataFrame({"user_id": [1, 1], "ts": ts, "value": [1.0, 1.0]})
    assert len(sessionize_group(g, gap_s=1800)) == 1


def test_sessionize_dataset(ray_session):
    import ray.data as rd

    rows = []
    for uid in range(5):
        for i in range(10):
            rows.append(
                {
                    "user_id": uid,
                    "ts": pd.Timestamp(2024, 1, 1) + pd.Timedelta(hours=i if i < 5 else i + 10),
                    "value": 1.0,
                }
            )
    out = sessionize(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    assert set(out["user_id"]) == set(range(5))
    assert (out.groupby("user_id")["n_events"].sum() == 10).all()


def sessionize(ds, gap_s=1800):
    from hybrid_sanctions_search_engine_ray.stages.windows import sessionize as _s

    return _s(ds, gap_s)


def test_broadcast_join(ray_session):
    import ray.data as rd

    big = rd.from_items([{"k": i % 3, "v": i} for i in range(100)])
    small = pd.DataFrame({"k": [0, 1, 2], "name": ["a", "b", "c"]})
    out = broadcast_join(big, small, on="k", concurrency=1).to_pandas()
    assert len(out) == 100
    assert set(out.columns) == {"k", "v", "name"}
    assert (out.loc[out.k == 0, "name"] == "a").all()


def test_bucketed_join_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(0)
    left = pd.DataFrame({"k": rng.integers(0, 50, 300), "lv": np.arange(300)})
    right = pd.DataFrame({"k": np.arange(50), "rv": np.arange(50) * 10})
    out = bucketed_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=8
    ).to_pandas()
    expect = left.merge(right, on="k")
    a = out.sort_values(["k", "lv"]).reset_index(drop=True)
    b = expect.sort_values(["k", "lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["k", "lv", "rv"]], b[["k", "lv", "rv"]], check_dtype=False)


def test_auto_date_histogram_ladder_choice(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.windows import auto_date_histogram

    # 30 distinct days -> hour (720 buckets) and day (30) exceed target 10,
    # week fits (<= 6 buckets)
    ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(np.arange(30), unit="D")
    ds = rd.from_pandas(pd.DataFrame({"ts": pd.Series(ts).astype("datetime64[us]")}))
    out = auto_date_histogram(ds, "ts", target_buckets=10)
    assert (out["interval_s"] == 604800).all()
    assert out["doc_count"].sum() == 30 and len(out) <= 10
    # generous target picks the finest (hour) rung
    out2 = auto_date_histogram(ds, "ts", target_buckets=10**6)
    assert (out2["interval_s"] == 3600).all()


def test_series_window_math(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.windows import series_window

    # counts per day: day0:2, day1:0 (gap), day2:1, day3:3
    days = [0, 0, 2, 3, 3, 3]
    ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(days, unit="D")
    ds = rd.from_pandas(pd.DataFrame({"ts": pd.Series(ts).astype("datetime64[us]")}))
    out = series_window(ds, "ts", 86400, lag=2, window=2)
    assert out["n_events"].tolist() == [2, 0, 1, 3]
    # sdiff lag 2, 0-seeded: [2-0, 0-0, 1-2, 3-0]
    assert out["sdiff"].tolist() == [2, 0, -1, 3]
    # mov_mean of previous up-to-2 buckets, 0.0 for the first
    assert out["mov_mean"].tolist() == [0.0, 2.0, 1.0, 0.5]


def test_auto_date_histogram_empty_input(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.windows import auto_date_histogram

    empty = rd.from_pandas(pd.DataFrame({"ts": pd.Series([], dtype="datetime64[us]")}))
    out = auto_date_histogram(empty, "ts", 10)
    assert len(out) == 0 and list(out.columns) == ["bucket", "interval_s", "doc_count"]


def test_downsample_roundtrip(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.windows import downsample

    base = dt.datetime(2024, 1, 1)
    rows = [
        # two buckets, two keys, values with cent rounding cases
        (base + dt.timedelta(minutes=5), "a", 1.005),
        (base + dt.timedelta(minutes=50), "a", 2.0),
        (base + dt.timedelta(minutes=20), "b", -3.555),
        (base + dt.timedelta(hours=1, minutes=1), "a", 10.0),
    ]
    tbl = pa.table({
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    out_dir = str(tmp_path / "rollup")
    out = downsample(rd.from_arrow(tbl), out_dir).to_pandas().sort_values(
        ["bucket", "event_type"]).reset_index(drop=True)
    b0 = int(base.timestamp() * 1_000_000) // 3_600_000_000
    assert list(out["bucket"]) == [b0, b0, b0 + 1]
    assert list(out["event_type"]) == ["a", "b", "a"]
    assert list(out["n"]) == [2, 1, 1]
    # exact cents: floor(|v|*100+.5)*sign — 1.005 is 1.00499… in binary
    # so it floors to 100 (the repo-wide cents convention, both sides agree)
    assert list(out["cents_sum"]) == [300, -356, 1000]
    assert out["value_min"].tolist() == [1.005, -3.555, 10.0]
    assert out["value_max"].tolist() == [2.0, -3.555, 10.0]
    # the answer really is the read-back files, and a re-run overwrites
    import os
    assert any(f.endswith(".parquet") for f in os.listdir(out_dir))
    again = downsample(rd.from_arrow(tbl), out_dir).to_pandas()
    assert len(again) == 3


def test_watermark_lateness_brute(ray_session):
    """watermark_lateness vs a sequential replay on synthetic
    out-of-order events (arrival = the Lehmer-permutation order, event
    time scrambled)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.windows import watermark_lateness

    rng = np.random.RandomState(4)
    n = 500
    eid = np.arange(n, dtype=np.int64)
    tsu = np.int64(1_700_000_000_000_000) + rng.permutation(n).astype(np.int64) * 7_200_000_000
    df = pd.DataFrame({"event_id": eid, "ts": pd.to_datetime(tsu, unit="us")})
    delay_s = 3600 * 24 * 5

    out = watermark_lateness(rd.from_pandas(df).repartition(4),
                             delay_s=delay_s, n_ranges=16)

    # brute sequential replay in Lehmer-arrival order (the stage's
    # BIGINT-arithmetic contract: ((id % P) * 48271) % P, P = 2^31-1)
    h = (eid % np.int64(2147483647)) * np.int64(48271) % np.int64(2147483647)
    order = np.lexsort((eid, h))
    wm = -np.inf
    late = np.zeros(n, dtype=bool)
    for i in order:
        wm = max(wm, tsu[i])
        late[i] = tsu[i] < wm - delay_s * 1_000_000
    win = tsu // (86400 * 1_000_000)
    exp = (pd.DataFrame({"window_id": win, "late": late})
           .groupby("window_id").agg(n_ontime=("late", lambda s: int((~s).sum())),
                                     n_late=("late", "sum")).reset_index())
    exp["n_late"] = exp["n_late"].astype(np.int64)
    exp["n_ontime"] = exp["n_ontime"].astype(np.int64)
    got = out.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp.astype({"window_id": np.int64}), check_dtype=False)
    assert got["n_late"].sum() > 0 and got["n_ontime"].sum() > 0
