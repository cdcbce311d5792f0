"""EQL sequence detection (stages/eql.py) vs a brute-force reference."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.stages.eql import eql_sequence, eql_sequence_group


def brute(df: pd.DataFrame, steps, maxspan_us):
    """O(n^2) earliest-follower reference: per anchor, walk the hops."""
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        for _, a in g[g.event_type == steps[0]].iterrows():
            cur_ts, ids = a.ts, [a.event_id]
            ok = True
            for s in steps[1:]:
                nxt = g[(g.event_type == s) & (g.ts > cur_ts)]
                if nxt.empty:
                    ok = False
                    break
                cur_ts, ids = nxt.iloc[0].ts, ids + [nxt.iloc[0].event_id]
            if ok and (maxspan_us is None or (cur_ts - a.ts).value <= maxspan_us * 1000):
                rows.append((uid, *ids, a.ts.value // 1000, cur_ts.value // 1000))
    cols = ["user_id"] + [f"e{i+1}_id" for i in range(len(steps))] + ["start_us", "end_us"]
    out = pd.DataFrame(rows, columns=cols)
    out["span_us"] = out["end_us"] - out["start_us"]
    return out


def mkdf(seed=7, n=400, users=6):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 30 * 86400 * 10**6, n)), unit="us")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "event_type": rng.choice(["signup", "purchase", "error", "click"], n),
        "ts": ts,
    })


@pytest.mark.parametrize("maxspan", [None, 86400 * 3])
def test_eql_matches_brute(ray_session, maxspan):
    df = mkdf()
    steps = ["signup", "purchase", "error"]
    got = (
        eql_sequence(rd.from_pandas(df).repartition(5), steps,
                     maxspan_s=maxspan)
        .to_pandas()
        .sort_values(["user_id", "e1_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = brute(df, steps, None if maxspan is None else maxspan * 10**6)
    want = want.sort_values(["user_id", "e1_id"], kind="mergesort").reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert (got[c].to_numpy().astype(np.int64) == want[c].to_numpy().astype(np.int64)).all(), c


def test_eql_two_step_tie_break():
    # two purchases at the SAME ts after the signup: min event_id wins.
    t0 = pd.Timestamp("2024-01-01")
    g = pd.DataFrame({
        "event_id": np.array([1, 5, 3], dtype=np.int64),
        "user_id": np.array([9, 9, 9], dtype=np.int64),
        "event_type": ["signup", "purchase", "purchase"],
        "ts": [t0, t0 + pd.Timedelta(seconds=10), t0 + pd.Timedelta(seconds=10)],
    })
    out = eql_sequence_group(g, ["signup", "purchase"], None,
                             "user_id", "ts", "event_id", "event_type")
    assert out["e2_id"].tolist() == [3]


def test_eql_strictness_exact():
    # purchase at the same ts as signup 0 does NOT match (strict >);
    # signup 0 chains past it to the later purchase.
    t0 = pd.Timestamp("2024-01-01")
    g = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.zeros(4, dtype=np.int64),
        "event_type": ["signup", "purchase", "signup", "purchase"],
        "ts": [t0, t0, t0 + pd.Timedelta(seconds=5), t0 + pd.Timedelta(seconds=100)],
    })
    out = eql_sequence_group(g, ["signup", "purchase"], None,
                             "user_id", "ts", "event_id", "event_type")
    assert sorted(zip(out.e1_id, out.e2_id)) == [(0, 3), (2, 3)]
    # maxspan 96 s drops the (0, 3) chain (span 100 s), keeps (2, 3) (95 s).
    out2 = eql_sequence_group(g, ["signup", "purchase"], 96 * 10**6,
                              "user_id", "ts", "event_id", "event_type")
    assert sorted(zip(out2.e1_id, out2.e2_id)) == [(2, 3)]


def test_eql_missing_step_empty():
    t0 = pd.Timestamp("2024-01-01")
    g = pd.DataFrame({
        "event_id": np.arange(2, dtype=np.int64),
        "user_id": np.zeros(2, dtype=np.int64),
        "event_type": ["signup", "signup"],
        "ts": [t0, t0 + pd.Timedelta(seconds=5)],
    })
    out = eql_sequence_group(g, ["signup", "purchase"], None,
                             "user_id", "ts", "event_id", "event_type")
    assert out.empty


def test_eql_requires_two_steps(ray_session):
    with pytest.raises(ValueError):
        eql_sequence(rd.from_pandas(mkdf(n=10)), ["signup"])
