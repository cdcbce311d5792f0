"""Local mimic of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on an sf dir, compare row count, schema
and order-insensitive values. Usage:

    PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _kind(dt) -> str:
    """Coarse dtype class used for the dtype-parity audit: the driver's
    value hash is dtype-sensitive, so an int64 Ray column vs a float64
    oracle column (e.g. DuckDB sum(BIGINT)->HUGEINT->float64) hashes
    red even when every value is numerically identical — the r03
    nb_classify root cause."""
    import numpy as np
    dt = np.dtype(dt) if not isinstance(dt, pd.api.types.CategoricalDtype) else np.dtype(object)
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.integer) or np.issubdtype(dt, np.bool_):
        return "int"
    if np.issubdtype(dt, np.datetime64):
        return "ts"
    return "obj"


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    issues = []
    if len(ray_df) != len(sql_df):
        issues.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        issues.append(f"columns ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return issues
    for c in sorted(ray_df.columns):
        ka, kb = _kind(ray_df[c].dtype), _kind(sql_df[c].dtype)
        if ka != kb:
            issues.append(f"dtype col {c}: ray={ray_df[c].dtype}({ka}) sql={sql_df[c].dtype}({kb})")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                bad = ~np.isclose(av.astype(float), bv.astype(float), atol=1e-12, equal_nan=True)
            else:
                bad = av != bv
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                issues.append(f"col {c}: {int(bad.sum())} diffs, first@{i}: ray={av[i]!r} sql={bv[i]!r}")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = {n for n in os.environ.get("ONLY", "").split(",") if n}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray raised {type(e).__name__}: {e}")
            failures += 1
            continue
        elapsed = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows ({elapsed:.1f}s)")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: sql raised {type(e).__name__}: {e}")
            failures += 1
            continue
        issues = compare(name, ray_df, sql_df)
        if issues:
            failures += 1
            print(f"FAIL {name} ({elapsed:.1f}s):")
            for i in issues:
                print(f"     {i}")
        else:
            print(f"ok   {name}: {len(ray_df)} rows match ({elapsed:.1f}s)")
    print("entry():", end=" ")
    e = to_pandas(entrymod.entry())
    print(f"{len(e)} rows, cols={sorted(e.columns)}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
