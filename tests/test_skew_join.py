"""skew_join (stages/joins.py): row-identity with bucketed_join on a
deliberately skewed corpus, and verification that BOTH routing paths
actually engage."""

from __future__ import annotations

import numpy as np
import pandas as pd

from hybrid_sanctions_search_engine_ray.stages.joins import bucketed_join, skew_join


def _sides(ray_session, blocks=4):
    import ray.data as rd

    rng = np.random.RandomState(0)
    # key 7 is pathologically hot (500 rows); keys 0..49 have ~8 each
    keys = np.concatenate([np.full(500, 7), rng.randint(0, 50, size=400)])
    left = pd.DataFrame({"k": keys.astype(np.int64),
                         "lval": np.arange(keys.size, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "rval": np.arange(50, dtype=np.int64) * 10})
    return (rd.from_pandas(left).repartition(blocks),
            rd.from_pandas(right).repartition(2), left, right)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:  # union with the tag-join's null side floats ints
        df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_skew_join_matches_plain(ray_session):
    l, r, lp, rp = _sides(ray_session)
    got = _canon(skew_join(l, r, on="k", hot_threshold=100).to_pandas())
    exp = _canon(lp.merge(rp, on="k", how="inner"))
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_skew_join_matches_bucketed(ray_session):
    l, r, lp, rp = _sides(ray_session)
    a = _canon(skew_join(l, r, on="k", hot_threshold=100).to_pandas())
    b = _canon(bucketed_join(l, r, on="k").to_pandas())
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_skew_join_paths_engage(ray_session):
    """hot_threshold between cold and hot counts → exactly key 7 is hot;
    threshold above everything → hot set empty (pure bucketed path).
    Results identical either way."""
    l, r, lp, rp = _sides(ray_session)
    hot_path = _canon(skew_join(l, r, on="k", hot_threshold=100).to_pandas())
    cold_only = _canon(skew_join(l, r, on="k", hot_threshold=10_000).to_pandas())
    pd.testing.assert_frame_equal(hot_path, cold_only)
    # sanity on the fixture: key 7 really is above / others below threshold
    counts = lp.groupby("k").size()
    assert counts[7] > 100 and (counts.drop(7) < 100).all()
