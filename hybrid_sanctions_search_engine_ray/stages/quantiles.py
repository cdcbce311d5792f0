"""Exact distributed order statistics (quantiles) for bounded-cardinality
value columns — the 100-TB-shaped alternative to a global sort.

Shape: one ``map_batches`` partial (per-batch (key, value) counts) → a
SMALL shuffle over distinct (key, value) pairs → a per-key finisher that
walks the cumulative counts. The raw rows never shuffle; only the
distinct-value histogram does. This is exact whenever the column's
distinct-value count per key fits a worker (quantized metrics, prices,
durations in ms — the common telemetry case). For genuinely continuous
columns use a mergeable sketch (``functions/sketches.py``) or a
sort+footer-offset selection instead.

Quantile rule: ``quantile_disc`` semantics — the element at 0-based
index ``max(ceil(q*n) - 1, 0)`` of the sorted column, computed with
exact rational arithmetic (``Fraction``) so float rounding of ``q*n``
can never pick a neighboring element. Verified against DuckDB
``quantile_disc`` across n/q edge cases (tools/check_oracle gate).

Reference parity: the reference keeps latency/score percentiles in its
monitoring layer (SURVEY.md §2.5 G6 metrics); this generalizes that to
a first-class distributed operator.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa


def _disc_index(q: Fraction, n: int) -> int:
    """0-based quantile_disc index: max(ceil(q*n) - 1, 0), exact."""
    return max(-((-q.numerator * n) // q.denominator) - 1, 0)


def hist_counts(ds, key: str, col: str):
    """The shared quantile shuffle: per-batch (key, value) count partials
    → one SMALL shuffle over distinct (key, value) pairs. Returns a
    Dataset (key, col, c) — the per-key value histogram; raw rows never
    move."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], col: b[col]})
        g = t.group_by([key, col]).aggregate([([], "count_all")])
        return g.rename_columns([key, col, "c_p"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, col])
        .aggregate(Sum("c_p", alias_name="c"))
    )


def interp_from_hist(vals: np.ndarray, cum: np.ndarray, n: int, frac: Fraction) -> float:
    """percentile_cont at rational position ``frac*(n-1)`` from a sorted
    value histogram (vals ascending, cum = cumulative counts): bracketing
    indices from exact rational arithmetic, float64 linear interpolation
    ``lo*(1-fr) + hi*fr`` (the documented DuckDB/Postgres rule)."""
    rn = frac * (n - 1)
    f_idx = rn.numerator // rn.denominator
    c_idx = -((-rn.numerator) // rn.denominator)
    lo = vals[int(np.searchsorted(cum, f_idx + 1, side="left"))]
    if c_idx == f_idx:
        return float(lo)
    hi = vals[int(np.searchsorted(cum, c_idx + 1, side="left"))]
    fr = float(rn - f_idx)
    return float(lo) * (1.0 - fr) + float(hi) * fr


def grouped_exact_quantiles(ds, key: str, col: str, qs: list[float]):
    """Exact per-``key`` quantiles of ``col`` over a Dataset.

    Returns a Dataset with columns (key, q: double, value) — one row per
    (key, quantile). ``qs`` entries must be exactly representable from
    their decimal literal (they are re-parsed via ``Fraction(str(q))``).
    """
    q_fracs = [(float(q), Fraction(str(q))) for q in qs]
    counts = hist_counts(ds, key, col)  # the shared quantile shuffle

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col, kind="mergesort")
        cum = g["c"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        vals = g[col].to_numpy()
        rows = []
        for qf, frac in q_fracs:
            j = int(np.searchsorted(cum, _disc_index(frac, n) + 1, side="left"))
            rows.append({key: g[key].iloc[0], "q": qf, "value": vals[j]})
        return pd.DataFrame(rows)

    return counts.groupby(key).map_groups(finish, batch_format="pandas")


def grouped_interp_quantiles(ds, key: str, col: str, qs: list[float]):
    """Exact per-``key`` INTERPOLATED quantiles (``quantile_cont`` /
    percentile_cont semantics: position ``q*(n-1)``, linear interpolation
    between the two bracketing order statistics) over the same
    value-count-histogram shuffle as :func:`grouped_exact_quantiles` —
    raw rows never move, only the distinct-value histogram does.

    Interpolation runs in float64 with the standard
    ``lo*(ceil-rn) + hi*(rn-floor)`` formula (the rule DuckDB/Postgres
    document for percentile_cont), with the bracketing INDICES derived
    from exact rational arithmetic so float rounding of ``q*(n-1)`` can
    never select the wrong neighbors.
    """
    q_fracs = [(float(q), Fraction(str(q))) for q in qs]
    counts = hist_counts(ds, key, col)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col, kind="mergesort")
        cum = g["c"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        vals = g[col].to_numpy(dtype=np.float64)
        rows = [
            {key: g[key].iloc[0], "q": qf, "value": interp_from_hist(vals, cum, n, frac)}
            for qf, frac in q_fracs
        ]
        return pd.DataFrame(rows)

    return counts.groupby(key).map_groups(finish, batch_format="pandas")


def psi_drift(ds, value_col: str, ts_col: str, n_bins: int = 10,
              split_us: int | None = None):
    """Population Stability Index drift monitor (the credit-scoring /
    MLOps training-serving drift metric): split the stream at the time
    midpoint (or ``split_us``), cut the REFERENCE half's exact integer-
    cents deciles, histogram both halves on those cuts, and report per
    bin ``(p_i − q_i)·ln(p_i/q_i)`` plus the PSI total (<0.1 stable,
    >0.25 drifted — the published rule of thumb).

    Scale shape (round-4 un-pin, no ``materialize()`` anywhere): pass 1
    is one scalar Min/Max(ts) aggregate over the pruned read; pass 2 is
    ONE bounded ``(cents, half)`` joint-histogram exchange (distinct
    cents values × 2 rows, regardless of corpus size). Decile cuts AND
    the per-(bin, half) counts both derive from that histogram on the
    driver — the raw rows stream through exactly twice and are never
    held in the object store. Zero-count bins take the standard ε=1e-6
    smoothing (deterministic, shared with the twin)."""
    import pandas as pd
    import pyarrow.compute as pc_
    from ray.data.aggregate import Max, Min, Sum

    from hybrid_sanctions_search_engine_ray.stages.textops import exact_cents

    def tsu_only(b: pa.Table) -> pa.Table:
        return pa.table({
            "tsu": pc_.cast(pc_.cast(b[ts_col], pa.timestamp("us")), pa.int64()),
        })

    mm = ds.map_batches(tsu_only, batch_format="pyarrow") \
           .aggregate(Min("tsu"), Max("tsu"))
    if mm["min(tsu)"] is None:
        raise ValueError("psi_drift: dataset has no rows")
    mid = split_us if split_us is not None else (mm["min(tsu)"] + mm["max(tsu)"]) // 2

    def joint_partial(b: pa.Table) -> pa.Table:
        tsu = pc_.cast(pc_.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        t = pa.table({
            "cents": exact_cents(b[value_col]),
            "half": pc_.cast(pc_.greater(tsu, mid), pa.int64()),
        })
        g = t.group_by(["cents", "half"]).aggregate([([], "count_all")])
        return pa.table({"cents": g["cents"], "half": g["half"],
                         "c_p": g["count_all"].cast(pa.int64())})

    joint = (ds.map_batches(joint_partial, batch_format="pyarrow")
             .groupby(["cents", "half"]).aggregate(Sum("c_p", alias_name="c"))
             .to_pandas().sort_values("cents", kind="mergesort"))
    jv = joint["cents"].to_numpy(np.int64)
    jh = joint["half"].to_numpy(np.int64)
    jc = joint["c"].to_numpy(np.int64)

    # exact reference-half deciles from the half==0 slice of the histogram
    ref = jh == 0
    vals, cnts = jv[ref], jc[ref]
    n_ref = int(cnts.sum())
    if n_ref == 0:
        # a split before the earliest timestamp leaves no reference
        # half: deciles are undefined — refuse with a clear error
        # instead of IndexError (code-review r05 finding)
        raise ValueError(
            "psi_drift: the reference half is empty (split_us precedes "
            "every event) — choose a split inside the data range")
    cum = np.cumsum(cnts)
    # quantile_disc cut k/n_bins: smallest value with cum ≥ ceil(q·n)
    cuts = np.array([vals[np.searchsorted(cum, -(-n_ref * k // n_bins))]
                     for k in range(1, n_bins)], dtype=np.int64)

    # (bin, half) counts straight from the same histogram — no third pass
    bin_ = np.searchsorted(cuts, jv, side="left")
    full = np.zeros((n_bins, 2), dtype=np.int64)
    np.add.at(full, (bin_, jh), jc)
    n0, n1 = full[:, 0].sum(), full[:, 1].sum()
    eps = 1e-6
    p = np.maximum(full[:, 0] / max(n0, 1), eps)
    q = np.maximum(full[:, 1] / max(n1, 1), eps)
    term = (p - q) * np.log(p / q)
    r4 = lambda x: np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4  # noqa: E731
    out = pd.DataFrame({
        "bin": np.arange(n_bins, dtype=np.int64),
        "n_ref": full[:, 0], "n_cur": full[:, 1],
        "psi_term": r4(term),
    })
    out["psi_total"] = r4(float(term.sum()))
    return out
