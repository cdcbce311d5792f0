

def test_interval_self_join_bruteforce(ray_session):
    """Bucket-replicated interval join equals the O(n²) per-user replay,
    including pairs that straddle a bucket boundary and tied timestamps
    (which pair in neither direction)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.windows import interval_self_join_stats

    rng = np.random.default_rng(5)
    rows = []
    for u in ("ua", "ub", "uc"):
        base = 1_700_000_000_000_000
        ts = base + np.sort(rng.integers(0, 20_000_000_000, size=40))
        ts[5] = ts[4]  # tie inside one user
        for t in ts:
            rows.append({"user_id": u, "ts": pd.Timestamp(int(t), unit="us")})
    ds = rd.from_pandas(pd.DataFrame(rows))
    gap_s = 1000  # small gap → many boundary-straddling pairs
    got = interval_self_join_stats(ds, max_gap_s=gap_s).set_index("k").sort_index()

    gap_us = gap_s * 1_000_000
    df = pd.DataFrame(rows)
    for u, g in df.groupby("user_id"):
        t = np.sort(g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy())
        n = s = 0
        for i in range(t.size):
            for j in range(t.size):
                d = t[j] - t[i]
                if 0 < d <= gap_us:
                    n += 1
                    s += int(d)
        assert int(got.loc[u, "n_pairs"]) == n, u
        assert int(got.loc[u, "sum_gap_us"]) == s, u
