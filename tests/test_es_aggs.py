"""ES aggregation operators (stages/es_aggs.py): boxplot, MAD,
weighted_avg, Welch t_test, multi_terms, range, filters, and the
bucket_script/selector/sort pipeline — checked against numpy/hand
computations on small in-memory Datasets."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hybrid_sanctions_search_engine_ray.stages import es_aggs


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df)


@pytest.fixture(scope="module")
def events_df(ray_session):
    rng = np.random.RandomState(7)
    n = 400
    return pd.DataFrame(
        {
            "event_type": rng.choice(["a", "b"], n),
            "value": np.round(rng.uniform(0, 100, n), 3),
            "ts": pd.to_datetime("2026-01-01") + pd.to_timedelta(rng.randint(0, 10, n), unit="D"),
        }
    )


def test_boxplot_matches_numpy(events_df):
    out = es_aggs.boxplot(_ds(events_df), "event_type", "value").to_pandas()
    for _, r in out.iterrows():
        v = events_df.loc[events_df.event_type == r["event_type"], "value"].to_numpy()
        assert r["v_min"] == v.min() and r["v_max"] == v.max()
        # numpy 'linear' interpolation == percentile_cont
        for col, q in (("q1", 0.25), ("q2", 0.5), ("q3", 0.75)):
            assert abs(r[col] - np.quantile(v, q)) < 1e-9, (col, r[col], np.quantile(v, q))


def test_mad_matches_two_pass_numpy(events_df):
    out = es_aggs.grouped_mad(_ds(events_df), "event_type", "value").to_pandas()
    for _, r in out.iterrows():
        v = events_df.loc[events_df.event_type == r["event_type"], "value"].to_numpy()
        want = np.quantile(np.abs(v - np.quantile(v, 0.5)), 0.5)
        assert abs(r["mad"] - want) < 1e-9


def test_weighted_avg_exact(ray_session):
    df = pd.DataFrame({"k": ["x", "x", "y"], "v": [10.0, 20.0, 5.0], "w": [1.0, 3.0, 2.0]})
    out = es_aggs.weighted_avg(_ds(df), "k", "v", "w").to_pandas().set_index("k")
    assert abs(out.loc["x", "weighted_avg"] - (10 * 1 + 20 * 3) / 4) < 1e-12
    assert abs(out.loc["y", "weighted_avg"] - 5.0) < 1e-12


def test_welch_t_test_matches_closed_form(events_df):
    out = es_aggs.welch_t_test(_ds(events_df), "event_type", "value", "a", "b")
    a = events_df.loc[events_df.event_type == "a", "value"].to_numpy()
    b = events_df.loc[events_df.event_type == "b", "value"].to_numpy()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / a.size + vb / b.size
    want_t = (a.mean() - b.mean()) / math.sqrt(se2)
    want_dof = se2**2 / ((va / a.size) ** 2 / (a.size - 1) + (vb / b.size) ** 2 / (b.size - 1))
    r = out.iloc[0]
    assert r["n_a"] == a.size and r["n_b"] == b.size
    assert abs(r["t_stat"] - want_t) < 1e-9
    assert abs(r["dof"] - want_dof) < 1e-6


def test_multi_terms_order_and_limit(ray_session):
    df = pd.DataFrame({"k1": ["a"] * 3 + ["b"] * 3 + ["c"] * 2,
                       "k2": ["x", "x", "x", "y", "y", "y", "z", "z"]})
    out = es_aggs.multi_terms(_ds(df), ["k1", "k2"], size=2)
    # ties (a,x)=3 and (b,y)=3 break keys-ascending; (c,z)=2 cut by size
    assert out[["k1", "k2", "doc_count"]].values.tolist() == [["a", "x", 3], ["b", "y", 3]]


def test_range_agg_buckets(ray_session):
    df = pd.DataFrame({"value": [5.0, 50.0, 100.0, 149.999, 150.0, 200.0]})
    out = es_aggs.range_agg(_ds(df), "value", [50.0, 150.0])
    got = out.set_index("bucket")
    assert got.loc[0, "doc_count"] == 1          # < 50
    assert got.loc[1, "doc_count"] == 3          # [50, 150): boundary 50 in, 150 out
    assert got.loc[2, "doc_count"] == 2
    assert got.loc[1, "range_from"] == 50.0 and got.loc[1, "range_to"] == 150.0
    assert abs(got.loc[2, "v_avg"] - 175.0) < 1e-12


def test_filters_agg_overlap(ray_session):
    df = pd.DataFrame({"text": ["spark joins data", "merge 42 rows", "nothing here", "spark merge"]})
    out = es_aggs.filters_agg(_ds(df), "text",
                              {"s": "spark", "jm": "join|merge", "d": "[0-9]"}).to_pandas()
    got = dict(zip(out["filter_name"], out["doc_count"]))
    assert got == {"s": 2, "jm": 3, "d": 1}


def test_bucket_pipeline_script_selector_sort(events_df):
    out = es_aggs.bucket_pipeline(_ds(events_df), "ts", 86400, "value",
                                  min_count=1, top=3)
    # recompute by hand
    us = events_df["ts"].astype("int64") // (86400 * 1_000_000)
    g = events_df.assign(bucket=us).groupby("bucket")["value"].agg(["count", "sum"]).reset_index()
    g["avg"] = (g["sum"] / g["count"]).round(4)
    g = g.sort_values(["avg", "bucket"], ascending=[False, True]).head(3)
    assert out["bucket"].tolist() == g["bucket"].tolist()
    assert out["doc_count"].tolist() == g["count"].tolist()
    np.testing.assert_allclose(out["avg_value"].to_numpy(), g["avg"].to_numpy(), atol=1e-9)


def test_bucket_pipeline_selector_filters(events_df):
    # min_count above the max per-day count: everything filtered
    out = es_aggs.bucket_pipeline(_ds(events_df), "ts", 86400, "value",
                                  min_count=10**9, top=3)
    assert len(out) == 0


def test_scripted_metric_geo_mean(events_df):
    import pyarrow as pa

    def map_script(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({"event_type": b["event_type"],
                      "s_ln": pa.array(np.log(v + 1.0)),
                      "n": pa.array(np.ones(v.size, np.int64))})
        return t.group_by("event_type").aggregate([("s_ln", "sum"), ("n", "sum")]
                                                  ).rename_columns(["event_type", "s_ln", "n"])

    def reduce_script(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"],
                             "gm": np.exp(b["s_ln"].to_numpy() / b["n"].to_numpy())})

    out = es_aggs.scripted_metric(_ds(events_df), "event_type", map_script,
                                  {"s_ln": "sum", "n": "sum"}, reduce_script).to_pandas()
    for _, r in out.iterrows():
        v = events_df.loc[events_df.event_type == r["event_type"], "value"].to_numpy()
        want = np.exp(np.log(v + 1.0).mean())
        assert abs(r["gm"] - want) < 1e-9
    with pytest.raises(ValueError):
        es_aggs.scripted_metric(_ds(events_df), "event_type", map_script,
                                {"s_ln": "avg"}, reduce_script)


def test_cumulative_cardinality_exact(ray_session):
    # user 1 first on day0, user 2 on day0, user 3 on day2; events span day0-3
    days = [0, 0, 1, 2, 3]
    users = [1, 2, 1, 3, 2]
    ts = (pd.to_datetime("2026-01-01") + pd.to_timedelta(days, unit="D")).astype("datetime64[us]")
    ds = _ds(pd.DataFrame({"user_id": np.array(users, np.int64), "ts": ts}))
    out = es_aggs.cumulative_cardinality(ds, "user_id", "ts", 86400)
    assert out["new_keys"].tolist() == [2, 0, 1, 0]
    assert out["cum_keys"].tolist() == [2, 2, 3, 3]


def test_welch_t_test_clear_errors(events_df):
    with pytest.raises(ValueError, match="not present"):
        es_aggs.welch_t_test(_ds(events_df), "event_type", "value", "a", "zzz")
    one = pd.DataFrame({"event_type": ["a", "b", "b"], "value": [1.0, 2.0, 3.0]})
    with pytest.raises(ValueError, match="needs >= 2"):
        es_aggs.welch_t_test(_ds(one), "event_type", "value", "a", "b")


def test_moving_percentiles_matches_numpy(events_df):
    df = events_df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = es_aggs.moving_percentiles(_ds(df), "ts", 86400, "value", window=3, qs=(0.5, 0.9))
    us = df["ts"].astype("int64") // (86400 * 1_000_000)
    days = np.sort(us.unique())
    assert out["bucket"].tolist() == days.tolist()
    for _, r in out.iterrows():
        v = df.loc[(us >= r["bucket"] - 2) & (us <= r["bucket"]), "value"].to_numpy()
        assert abs(r["p50"] - np.quantile(v, 0.5)) < 1e-9
        assert abs(r["p90"] - np.quantile(v, 0.9)) < 1e-9


def test_moving_percentiles_empty(ray_session):
    import ray.data as rd

    empty = rd.from_pandas(pd.DataFrame({"ts": pd.Series([], dtype="datetime64[us]"),
                                         "value": pd.Series([], dtype=np.float64)}))
    out = es_aggs.moving_percentiles(empty, "ts", 86400, "value", window=2, qs=(0.5,))
    assert len(out) == 0 and list(out.columns) == ["bucket", "p50"]


def test_histogram_gap_fill(events_df):
    out = es_aggs.histogram(_ds(events_df), "value", interval=10.0)
    k = np.floor(events_df["value"].to_numpy() / 10.0).astype(np.int64)
    want = pd.Series(k).value_counts().reindex(
        np.arange(k.min(), k.max() + 1), fill_value=0)
    assert out["doc_count"].tolist() == want.tolist()
    assert out["bucket_key"].tolist() == (want.index * 10.0).tolist()
    # min_doc_count filters instead of gap-filling
    out2 = es_aggs.histogram(_ds(events_df), "value", interval=10.0, min_doc_count=5)
    assert (out2["doc_count"] >= 5).all()


def test_histogram_empty(ray_session):
    import ray.data as rd

    empty = rd.from_pandas(pd.DataFrame({"value": pd.Series([], dtype=np.float64)}))
    out = es_aggs.histogram(empty, "value", interval=10.0)
    assert len(out) == 0 and "bucket_key" in out.columns


def test_top_metrics_argmax_with_tiebreak(ray_session):
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b"],
        "sortv": [5.0, 9.0, 9.0, 1.0, 1.0],
        "tid": np.array([1, 2, 3, 7, 4], np.int64),
        "m": np.array([10, 20, 30, 70, 40], np.int64),
    })
    out = es_aggs.top_metrics(_ds(df), "k", "sortv", "tid", ["m"])
    got = out.set_index("k")
    # a: max sortv 9.0 tie -> larger tid (3, m=30); b: tie -> tid 7 (m=70)
    assert got.loc["a", "m"] == 30 and got.loc["a", "tid"] == 3
    assert got.loc["b", "m"] == 70 and got.loc["b", "tid"] == 7


def test_sibling_bucket_stats(events_df):
    df = events_df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = es_aggs.sibling_bucket_stats(_ds(df), "ts", 86400)
    us = df["ts"].astype("int64") // (86400 * 1_000_000)
    n = us.value_counts().sort_index()
    r = out.iloc[0]
    assert r["n_buckets"] == len(n) and r["sum_count"] == len(df)
    assert r["min_count"] == n.min() and r["max_count"] == n.max()
    assert r["min_bucket"] == n.index[np.argmax(n.to_numpy() == n.min())]
    assert r["max_bucket"] == n.index[np.argmax(n.to_numpy() == n.max())]
    assert abs(r["avg_count"] - round(len(df) / len(n), 6)) < 1e-12


def test_normalize_series_rescale(events_df):
    df = events_df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = es_aggs.normalize_series(_ds(df), "ts", 86400)
    n = out["n_events"].to_numpy()
    mn, mx = n.min(), n.max()
    np.testing.assert_allclose(out["norm"].to_numpy(),
                               np.round((n - mn) / (mx - mn), 6), atol=0)
    # flat series -> all zeros
    flat = pd.DataFrame({"ts": pd.to_datetime(["2026-01-01", "2026-01-02"]).astype("datetime64[us]")})
    out2 = es_aggs.normalize_series(_ds(flat), "ts", 86400)
    assert out2["norm"].tolist() == [0.0, 0.0]


def test_percentiles_bucket_matches_numpy(events_df):
    df = events_df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = es_aggs.percentiles_bucket(_ds(df), "ts", 86400, qs=(0.5, 0.9))
    us = df["ts"].astype("int64") // (86400 * 1_000_000)
    n = us.value_counts().reindex(np.arange(us.min(), us.max() + 1), fill_value=0).to_numpy()
    assert abs(out["p50"].iloc[0] - np.quantile(n, 0.5)) < 1e-12
    assert abs(out["p90"].iloc[0] - np.quantile(n, 0.9)) < 1e-12


def test_matrix_stats_matches_numpy(ray_session):
    rng = np.random.RandomState(3)
    x = rng.randint(1, 50, 300).astype(np.int64)
    y = (x // 2 + rng.randint(0, 10, 300)).astype(np.int64)
    out = es_aggs.matrix_stats(_ds(pd.DataFrame({"x": x, "y": y})), ["x", "y"])
    r = out.iloc[0]
    assert r["n_rows"] == 300
    assert abs(r["cov"] - round(float(np.cov(x, y, ddof=1)[0, 1]), 6)) < 1e-6
    assert abs(r["corr"] - round(float(np.corrcoef(x, y)[0, 1]), 6)) < 1e-6
    with pytest.raises(Exception, match="integer-valued"):  # Ray wraps the ValueError
        es_aggs.matrix_stats(_ds(pd.DataFrame({"x": [1.5, 2.0], "y": [1.0, 2.0]})), ["x", "y"])


def test_bucket_correlation_matches_numpy(events_df):
    df = events_df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = es_aggs.bucket_correlation(_ds(df), "event_type", "a", "b", "ts", 86400)
    us = df["ts"].astype("int64") // (86400 * 1_000_000)
    grid = np.arange(us.min(), us.max() + 1)
    a = us[df.event_type == "a"].value_counts().reindex(grid, fill_value=0).to_numpy()
    b = us[df.event_type == "b"].value_counts().reindex(grid, fill_value=0).to_numpy()
    assert abs(out["corr"].iloc[0] - round(float(np.corrcoef(a, b)[0, 1]), 6)) < 1e-6
    with pytest.raises(ValueError, match="no rows"):
        es_aggs.bucket_correlation(_ds(df), "event_type", "zz1", "zz2", "ts", 86400)


def test_string_stats_entropy(ray_session):
    texts = ["aab", "b", "", "ccc"]
    out = es_aggs.string_stats(_ds(pd.DataFrame({"t": texts})), "t")
    r = out.iloc[0]
    assert r["n_docs"] == 4 and r["min_len"] == 0 and r["max_len"] == 3
    assert r["n_distinct_chars"] == 3
    # counts: a=2, b=2, c=3, N=7
    c = np.array([2, 2, 3], dtype=np.float64)
    want = np.log2(7) - (c * np.log2(c)).sum() / 7
    assert abs(r["entropy"] - round(want, 4)) < 1e-9
    assert abs(r["avg_len"] - round(7 / 4, 6)) < 1e-12


def test_has_child_avg_min_children(ray_session, tmp_path):
    # via ConvScorer directly on a tiny index built from fixtures
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.pipelines.query import ConvScorer

    with pytest.raises(ValueError, match="score_mode"):
        ConvScorer("/nonexistent", 8, score_mode="median")


def test_cumulative_sum_gap_fill(events_df):
    df = events_df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = es_aggs.cumulative_sum(_ds(df), "ts", 86400)
    assert (np.diff(out["cum_n"]) == out["n_events"].to_numpy()[1:]).all()
    assert out["cum_n"].iloc[-1] == len(df)
    assert (np.diff(out["bucket"]) == 1).all()  # gap-filled grid


def test_rate_agg_units(ray_session):
    ts = pd.to_datetime(["2026-01-01", "2026-01-01", "2026-01-03"]).astype("datetime64[us]")
    df = pd.DataFrame({"ts": ts, "value": [10.00, 14.00, 2.405]})
    out = es_aggs.rate_agg(_ds(df), "ts", "value", 86400, 3600)
    assert len(out) == 3  # gap-filled middle day
    assert abs(out["doc_rate"].iloc[0] - round(2 / 24.0, 6)) < 1e-12
    assert out["doc_rate"].iloc[1] == 0.0 and out["value_rate"].iloc[1] == 0.0
    # 2.405 is 2.40499… in binary → 240 cents on BOTH sides, /100/24
    assert abs(out["value_rate"].iloc[2] - round(2.40 / 24.0, 6)) < 1e-9


def test_categorize_text_templates(ray_session):
    texts = ["Error 42 in module 7", "error 9 in module 12", "ok done", None]
    out = es_aggs.categorize_text(_ds(pd.DataFrame({"text": texts})), "text",
                                  n_tokens=4, top_n=10)
    m = dict(zip(out["category"], out["n_docs"]))
    assert m["error <num> in module"] == 2
    assert m["ok done"] == 1 and m[""] == 1
    # (count desc, category asc) ordering
    assert out["category"].iloc[0] == "error <num> in module"


def test_change_point_step(ray_session):
    # 5 quiet days then 5 busy days → split after day 5
    days, counts = [], []
    for d in range(10):
        c = 2 if d < 5 else 20
        days += [f"2026-01-{d+1:02d}"] * c
    df = pd.DataFrame({"ts": pd.to_datetime(days).astype("datetime64[us]")})
    out = es_aggs.change_point(_ds(df), "ts", 86400)
    r = out.iloc[0]
    base = pd.Timestamp("2026-01-06").value // 1000 // 86400000000
    assert r["change_bucket"] == base
    assert r["mean_before"] == 2.0 and r["mean_after"] == 20.0 and r["gap"] == 18.0
    with pytest.raises(ValueError, match=">= 2"):
        es_aggs.change_point(_ds(df.head(2)), "ts", 86400)


def test_ks_test_identical_and_disjoint(ray_session):
    ts = pd.to_datetime(["2026-01-01"] * 4 + ["2026-01-02"] * 4).astype("datetime64[us]")
    same = pd.DataFrame({"ts": ts, "event_type": ["a", "b"] * 4})
    out = es_aggs.ks_test(_ds(same), "event_type", "a", "b", "ts", 86400)
    assert out["d_stat"].iloc[0] == 0.0
    dis = pd.DataFrame({"ts": ts, "event_type": ["a"] * 4 + ["b"] * 4})
    out2 = es_aggs.ks_test(_ds(dis), "event_type", "a", "b", "ts", 86400)
    assert out2["d_stat"].iloc[0] == 1.0  # fully separated distributions
    with pytest.raises(ValueError, match="no rows"):
        es_aggs.ks_test(_ds(dis), "event_type", "zz", "zy", "ts", 86400)


def test_global_agg_hand_math(ray_session):
    df = pd.DataFrame({"event_type": ["click", "view", "click"],
                       "value": [1.00, 2.00, 0.50]})
    out = es_aggs.global_agg(_ds(df), "value", "event_type", "click")
    r = out.iloc[0]
    assert r["n_total"] == 3 and r["sum_value_total"] == 3.5
    assert r["n_filtered"] == 2 and r["sum_value_filtered"] == 1.5
    assert abs(r["avg_value_filtered"] - 0.75) < 1e-12
    with pytest.raises(ValueError, match="empty"):
        es_aggs.global_agg(_ds(df), "value", "event_type", "nope")


def test_extended_stats_bucket_population_variance(events_df):
    df = events_df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = es_aggs.extended_stats_bucket(_ds(df), "ts", 86400, sigma=2.0)
    r = out.iloc[0]
    us = df["ts"].astype("int64") // (86400 * 1_000_000)
    n = us.value_counts().reindex(np.arange(us.min(), us.max() + 1), fill_value=0).to_numpy()
    assert r["n_buckets"] == n.size and r["sum_count"] == n.sum()
    assert abs(r["variance"] - round(float(np.var(n)), 6)) < 1e-6  # population var
    assert abs(r["upper_bound"] - round(n.mean() + 2 * np.std(n), 6)) < 1e-6


def test_daily_cardinality_exact(ray_session):
    days = [0, 0, 0, 2, 2]
    users = [1, 1, 2, 3, 3]
    ts = (pd.to_datetime("2026-01-01") + pd.to_timedelta(days, unit="D")).astype("datetime64[us]")
    ds = _ds(pd.DataFrame({"user_id": np.array(users, np.int64), "ts": ts}))
    out = es_aggs.daily_cardinality(ds, "user_id", "ts", 86400)
    assert out["n_distinct"].tolist() == [2, 0, 1]  # gap day reports 0


def test_date_histogram_terms_long_format(events_df):
    df = events_df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = es_aggs.date_histogram_terms(_ds(df), "event_type", "ts", 86400)
    us = df["ts"].astype("int64") // (86400 * 1_000_000)
    want = df.assign(bucket=us).groupby(["bucket", "event_type"]).size()
    got = out.set_index(["bucket", "k"])["n"]
    assert got.to_dict() == want.to_dict()


# --- missing_agg ------------------------------------------------------------


def test_missing_agg_counts(ray_session):
    df = pd.DataFrame({"role": ["user", "user", "assistant", "tool", "tool"],
                       "tool": ["", "search", "", "sql", None]})
    out = es_aggs.missing_agg(_ds(df), "role", "tool")
    got = out.set_index("role")
    assert got.loc["user", "doc_count"] == 2 and got.loc["user", "missing_count"] == 1
    assert got.loc["assistant", "missing_count"] == 1
    # None counts as missing (fill_null to the marker)
    assert got.loc["tool", "doc_count"] == 2 and got.loc["tool", "missing_count"] == 1
    assert list(out["role"]) == sorted(out["role"])


def test_missing_agg_empty(ray_session):
    import ray.data as rd

    empty = rd.from_pandas(pd.DataFrame({"role": pd.Series([], dtype=object),
                                         "tool": pd.Series([], dtype=object)}))
    out = es_aggs.missing_agg(empty, "role", "tool")
    assert out.empty and list(out.columns) == ["role", "doc_count", "missing_count"]


# --- terms_shard_bounds -----------------------------------------------------


def _tsb_reference(df, n_shards, shard_size, size, salt):
    """Independent brute-force of the ES shard-merge rule."""
    import hashlib

    def shard_of(i):
        d = hashlib.md5((str(i) + salt).encode()).digest()
        return int.from_bytes(d[:8], "little") % n_shards

    df = df.assign(shard=[shard_of(i) for i in df["id"]])
    counts = df.groupby(["shard", "term"]).size()
    kept = {}
    err = {}
    for sh in sorted({s for s, _ in counts.index}):
        sub = counts[sh].sort_index()
        ordered = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:shard_size]
        kept[sh] = dict(ordered)
        err[sh] = min(kept[sh].values()) if len(ordered) == shard_size else 0
    cands = sorted({t for k in kept.values() for t in k})
    rows = []
    for t in cands:
        dc = sum(k.get(t, 0) for k in kept.values())
        eb = sum(err[sh] for sh, k in kept.items() if t not in k)
        rows.append((t, dc, eb))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:size]


def test_terms_shard_bounds_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    terms = [f"t{int(x)}" for x in rng.integers(0, 12, size=400)]
    df = pd.DataFrame({"id": np.arange(400), "term": terms})
    out = es_aggs.terms_shard_bounds(_ds(df.rename(columns={"term": "src"})), "src", "id",
                                     n_shards=4, shard_size=3, size=5, salt="-x")
    expect = _tsb_reference(df, 4, 3, 5, "-x")
    got = [tuple(r) for r in out[["term", "doc_count", "err_bound"]].itertuples(index=False)]
    assert got == expect
    # the bound is nonzero somewhere: 12 terms > shard_size 3 forces truncation
    assert out["err_bound"].max() > 0


def test_terms_shard_bounds_exhaustive_shard_zero_error(ray_session):
    # 2 distinct terms < shard_size → every shard exhaustive → zero bounds
    df = pd.DataFrame({"id": np.arange(60), "src": ["a", "b"] * 30})
    out = es_aggs.terms_shard_bounds(_ds(df), "src", "id",
                                     n_shards=4, shard_size=5, size=5, salt="-x")
    assert (out["err_bound"] == 0).all()
    assert int(out["doc_count"].sum()) == 60


def test_date_range_agg_buckets(ray_session):
    df = pd.DataFrame({
        "ts": pd.to_datetime(["2023-12-31", "2024-01-08", "2024-01-10",
                              "2024-01-15", "2024-01-30"]).astype("datetime64[us]"),
        "value": [1.0, 2.0, 4.0, 8.0, 16.0],
    })
    out = es_aggs.date_range_agg(_ds(df), "ts",
                                 ["2024-01-08", "2024-01-15", "2024-01-22"],
                                 "value")
    by = out.set_index("bucket")
    # edge rows land in the bucket they OPEN (half-open [from, to))
    assert by.loc[0, "doc_count"] == 1 and by.loc[0, "v_sum"] == 1.0
    assert by.loc[1, "doc_count"] == 2 and by.loc[1, "v_sum"] == 6.0
    assert by.loc[2, "doc_count"] == 1 and by.loc[2, "v_sum"] == 8.0
    assert by.loc[3, "doc_count"] == 1 and by.loc[3, "v_sum"] == 16.0
    assert by.loc[1, "range_from"] == "2024-01-08"
    assert by.loc[0, "range_from"] == "" and by.loc[3, "range_to"] == ""
    with pytest.raises(ValueError, match="increasing"):
        es_aggs.date_range_agg(_ds(df), "ts", ["2024-01-15", "2024-01-08"], "value")


def test_random_sampler_agg_deterministic(ray_session):
    import hashlib

    df = pd.DataFrame({"event_id": np.arange(200, dtype=np.int64),
                       "value": np.arange(200, dtype=np.float64) * 0.5})
    out = es_aggs.random_sampler_agg(_ds(df), "event_id", "value",
                                     mod=5, salt="-t")
    keep = np.array([
        int.from_bytes(hashlib.md5((str(i) + "-t").encode()).digest()[:8],
                       "little") % 5 == 0
        for i in df["event_id"]
    ])
    assert int(out["sampled_count"].iloc[0]) == int(keep.sum())
    assert int(out["est_doc_count"].iloc[0]) == int(keep.sum()) * 5
    assert abs(out["v_avg_sample"].iloc[0]
               - df.loc[keep, "value"].mean()) < 1e-9
    # identical rows on a rerun — membership is a pure row property
    out2 = es_aggs.random_sampler_agg(_ds(df), "event_id", "value",
                                      mod=5, salt="-t")
    assert out.equals(out2)


def test_variable_width_histogram_equal_depth(events_df):
    out = es_aggs.variable_width_histogram(_ds(events_df), "value", 4).reset_index(drop=True)
    cents = np.floor(np.abs(events_df.value.to_numpy()) * 100.0 + 0.5).astype(np.int64) \
        * np.sign(events_df.value.to_numpy()).astype(np.int64)
    n = cents.size
    assert int(out.doc_count.sum()) == n
    # equal depth within one boundary-tie: every cut lands at ceil(i*n/4)
    u, c = np.unique(cents, return_counts=True)
    cum = c.cumsum()
    cuts = np.unique(u[np.searchsorted(cum, [-(-i * n // 4) for i in (1, 2, 3)], "left")])
    bucket = np.searchsorted(cuts, u, side="left")
    for b_idx in range(len(out)):
        m = bucket == b_idx
        row = out.iloc[b_idx]
        assert row.doc_count == c[m].sum()
        assert row.v_min == u[m].min() / 100.0
        assert row.v_max == u[m].max() / 100.0
    # buckets tile the value range without overlap
    assert all(out.v_min.iloc[i + 1] > out.v_max.iloc[i] for i in range(len(out) - 1))


def test_variable_width_histogram_skew_collapses_cuts(ray_session):
    # one dominant value swallows several quantile cuts → fewer buckets
    df = pd.DataFrame({"value": np.r_[np.full(97, 5.0), [1.0, 2.0, 9.0]]})
    out = es_aggs.variable_width_histogram(_ds(df), "value", 5)
    assert int(out.doc_count.sum()) == 100
    assert len(out) <= 3  # duplicate cuts collapsed
    assert (out.v_min <= out.v_max).all()


def test_welch_constant_groups_yield_nan_not_crash(ray_session):
    """Two constant-valued groups have zero pooled SE — the t statistic
    is undefined; report NaN instead of ZeroDivisionError
    (code-review r05)."""
    import math

    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.es_aggs import welch_t_test

    ds = rd.from_items([{"g": "a", "v": 5.0}] * 3 + [{"g": "b", "v": 7.0}] * 3)
    out = welch_t_test(ds, "g", "v", "a", "b")
    assert math.isnan(out["t_stat"].iloc[0])
    assert out["mean_a"].iloc[0] == 5.0 and out["mean_b"].iloc[0] == 7.0


def test_matrix_stats_constant_column_nan_corr(ray_session):
    import math

    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.es_aggs import matrix_stats

    ds = rd.from_items([{"a": float(i), "b": 7.0} for i in range(10)])
    out = matrix_stats(ds, ["a", "b"])
    row = out[(out.field_x == "a") & (out.field_y == "b")].iloc[0]
    assert math.isnan(row["corr"])
    assert row["var_y"] == 0.0


def test_range_agg_skips_missing_values(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.es_aggs import range_agg

    ds = rd.from_items([{"v": 1.0}, {"v": 5.0}, {"v": None}, {"v": 50.0}])
    out = range_agg(ds, "v", [0.0, 10.0])
    assert int(out["doc_count"].sum()) == 3  # the null contributes nowhere
    assert not out["v_sum"].isna().any()
