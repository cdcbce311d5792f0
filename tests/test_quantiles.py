"""Exact distributed quantiles (stages/quantiles.py): quantile_disc
index rule and the histogram-partial pipeline."""

from fractions import Fraction

import numpy as np
import pandas as pd
import ray.data as rd

from hybrid_sanctions_search_engine_ray.stages.quantiles import (
    _disc_index,
    grouped_exact_quantiles,
)


def test_disc_index_rule():
    # index = max(ceil(q*n) - 1, 0), exact rational — DuckDB quantile_disc
    assert _disc_index(Fraction("0.5"), 4) == 1
    assert _disc_index(Fraction("0.91"), 10) == 9
    assert _disc_index(Fraction("0.0"), 10) == 0
    assert _disc_index(Fraction("1.0"), 10) == 9
    assert _disc_index(Fraction("0.7"), 100) == 69   # float ceil(70.000000001) would say 70
    assert _disc_index(Fraction("0.25"), 4) == 0


def _reference(df: pd.DataFrame, qs) -> set:
    out = set()
    for k, g in df.groupby("k"):
        v = np.sort(g["v"].to_numpy())
        n = v.size
        for q in qs:
            idx = _disc_index(Fraction(str(q)), n)
            out.add((k, q, float(v[idx])))
    return out


def test_grouped_exact_quantiles_matches_sorted_selection(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, size=5000).astype(str),
        # quantized values with heavy duplication — the operator's home turf
        "v": np.round(rng.exponential(20.0, size=5000), 1),
    })
    ds = rd.from_pandas(df).repartition(8)
    qs = [0.25, 0.5, 0.9, 0.99]
    got = grouped_exact_quantiles(ds, key="k", col="v", qs=qs).to_pandas()
    got_set = {(r.k, r.q, float(r.value)) for r in got.itertuples()}
    assert got_set == _reference(df, qs)
    assert len(got) == 4 * len(qs)


def test_grouped_exact_quantiles_single_value_group(ray_session):
    df = pd.DataFrame({"k": ["a"] * 7, "v": [3.0] * 7})
    got = grouped_exact_quantiles(rd.from_pandas(df), key="k", col="v", qs=[0.5, 0.99]).to_pandas()
    assert got["value"].tolist() == [3.0, 3.0]


def test_psi_drift_detects_shift(ray_session):
    """Stable halves → PSI ~ 0; shifted second half → PSI above the
    0.25 'drifted' rule of thumb. Brute replay validates the bins."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.quantiles import psi_drift

    rng = np.random.RandomState(2)
    n = 2000
    base = rng.exponential(50.0, n).round(2)
    stable = pd.DataFrame({
        "value": base,
        "ts": pd.to_datetime(1_700_000_000_000_000 + np.arange(n) * 1_000_000,
                             unit="us"),
    })
    out = psi_drift(rd.from_pandas(stable).repartition(4), "value", "ts")
    assert out["psi_total"].iloc[0] < 0.1
    assert int(out["n_ref"].sum() + out["n_cur"].sum()) == n

    shifted = stable.copy()
    half = n // 2
    shifted.loc[half:, "value"] = (base[half:] * 3.0 + 100).round(2)
    out2 = psi_drift(rd.from_pandas(shifted).repartition(4), "value", "ts")
    assert out2["psi_total"].iloc[0] > 0.25
