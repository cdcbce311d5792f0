"""asof_join (per-key temporal merge) and range_join (broadcast binning)
— custom operators Ray Data lacks natively (stages/joins.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.stages.joins import asof_join, range_join


def _left():
    return rd.from_pandas(pd.DataFrame({
        "lid": [1, 2, 3, 4, 5],
        "k": [10, 10, 10, 20, 30],
        "t": [100, 250, 50, 500, 7],
    }))


def _right():
    return rd.from_pandas(pd.DataFrame({
        "rid": [101, 102, 103, 104],
        "k": [10, 10, 10, 20],
        "t": [90, 200, 400, 500],
        "v": [1.0, 2.0, 3.0, 4.0],
    }))


def test_asof_inner_matches_pandas_merge_asof(ray_session):
    got = asof_join(_left(), _right(), key="k", ts="t", how="inner").to_pandas()
    got = got.sort_values("lid").reset_index(drop=True)
    # lid=1 t=100 → rid 101 (t=90); lid=2 t=250 → rid 102 (t=200);
    # lid=3 t=50 → no right ≤ 50; lid=4 t=500 → rid 104 (t=500, inclusive);
    # lid=5 k=30 → no right side at all
    assert got["lid"].tolist() == [1, 2, 4]
    assert got["rid"].tolist() == [101, 102, 104]
    assert got["v"].tolist() == [1.0, 2.0, 4.0]
    # cross-check vs pandas merge_asof on the same data
    lf = _left().to_pandas().sort_values("t")
    rf = _right().to_pandas().sort_values("t")
    ref = pd.merge_asof(lf, rf, on="t", by="k", direction="backward").dropna(subset=["rid"])
    assert sorted(ref["lid"].tolist()) == [1, 2, 4]


def test_asof_left_keeps_unmatched(ray_session):
    got = asof_join(_left(), _right(), key="k", ts="t", how="left").to_pandas()
    got = got.sort_values("lid").reset_index(drop=True)
    assert len(got) == 5
    assert got.loc[got["lid"] == 3, "rid"].isna().all()
    assert got.loc[got["lid"] == 5, "rid"].isna().all()  # key with empty right group
    assert got.loc[got["lid"] == 1, "rid"].tolist() == [101]


def test_asof_collision_rename(ray_session):
    left = rd.from_pandas(pd.DataFrame({"k": [1], "t": [10], "v": [99.0]}))
    right = rd.from_pandas(pd.DataFrame({"k": [1], "t": [5], "v": [1.5]}))
    got = asof_join(left, right, key="k", ts="t", how="inner").to_pandas()
    assert got["v"].tolist() == [99.0]      # left column untouched
    assert got["v_r"].tolist() == [1.5]     # right collision renamed
    assert got["t_r"].tolist() == [5]


def test_range_join_bins_and_filters(ray_session):
    ranges = pd.DataFrame({"tier": ["a", "b"], "lo": [0.0, 10.0], "hi": [10.0, 20.0]})
    big = rd.from_pandas(pd.DataFrame({"x": [0.0, 9.999, 10.0, 19.0, 25.0, -1.0]}))
    got = range_join(big, ranges, on="x", how="inner").to_pandas().sort_values("x")
    # 25.0 and -1.0 fall outside every [lo, hi) and are dropped
    assert got["x"].tolist() == [0.0, 9.999, 10.0, 19.0]
    assert got["tier"].tolist() == ["a", "a", "b", "b"]


def test_range_join_left_nulls(ray_session):
    ranges = pd.DataFrame({"tier": ["a"], "lo": [0.0], "hi": [1.0]})
    big = rd.from_pandas(pd.DataFrame({"x": [0.5, 5.0]}))
    got = range_join(big, ranges, on="x", how="left").to_pandas().sort_values("x")
    assert got["tier"].tolist()[0] == "a"
    assert pd.isna(got["tier"].tolist()[1])


def test_range_join_rejects_overlap(ray_session):
    ranges = pd.DataFrame({"tier": ["a", "b"], "lo": [0.0, 5.0], "hi": [6.0, 10.0]})
    big = rd.from_pandas(pd.DataFrame({"x": [1.0]}))
    with pytest.raises(Exception):  # surfaced via Ray as a wrapped actor error
        range_join(big, ranges, on="x").to_pandas()


def test_range_join_empty_ranges(ray_session):
    empty = pd.DataFrame({"tier": pd.Series([], dtype=str),
                          "lo": pd.Series([], dtype=float),
                          "hi": pd.Series([], dtype=float)})
    big = rd.from_pandas(pd.DataFrame({"x": [1.0, 2.0]}))
    assert len(range_join(big, empty, on="x", how="inner").to_pandas()) == 0
    left = range_join(big, empty, on="x", how="left").to_pandas()
    assert len(left) == 2 and left["tier"].isna().all()


def test_bloom_prefilter_counts_and_false_positives(ray_session):
    """With a tiny bit array the filter must pass all true keys (no
    false negatives — Bloom guarantee) and the measured false-positive
    accounting must equal a brute replay of the same hash layout."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.joins import bloom_prefilter_stats

    m = 16  # tiny → collisions guaranteed
    right = [str(k) for k in (3, 7, 11)]
    left_keys = [str(k) for k in range(100)] * 3
    ds = rd.from_pandas(pd.DataFrame({"k": left_keys}))
    got = bloom_prefilter_stats(ds, "k", right, m_bits=m).iloc[0]

    def h(s, salt=""):
        return int.from_bytes(hashlib.md5((s + salt).encode()).digest()[:8],
                              "little") % m

    bits = np.zeros(m, bool)
    for k in right:
        bits[h(k)] = True
        bits[h(k, "#")] = True
    n_pass = sum(bits[h(k)] and bits[h(k, "#")] for k in left_keys)
    n_true = sum(k in right for k in left_keys)
    assert int(got["n_left"]) == 300
    assert int(got["n_true_match"]) == n_true == 9
    assert int(got["n_bloom_pass"]) == n_pass
    assert int(got["n_false_pos"]) == n_pass - n_true > 0  # collisions real
    # no false negatives: every true key passes
    assert n_pass >= n_true
