"""Geo family (stages/geo.py): derived-coordinate bounding box and
equal-degree grid — hand-math on a tiny in-memory Dataset."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.stages import geo


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df)


def test_derive_coords_ranges_and_determinism():
    k = np.arange(1000, dtype=np.int64)
    lat, lon = geo.derive_coords(k)
    assert (lat >= -90).all() and (lat < 90).all()
    assert (lon >= -180).all() and (lon < 180).all()
    lat2, lon2 = geo.derive_coords(k)
    assert (lat == lat2).all() and (lon == lon2).all()


def test_geo_bbox_counts_and_cents(ray_session):
    df = pd.DataFrame({"c_custkey": np.arange(1, 501, dtype=np.int64),
                       "c_acctbal": np.round(np.linspace(-100, 400, 500), 2)})
    lat, lon = geo.derive_coords(df["c_custkey"].to_numpy())
    box = (0.0, 45.0, -90.0, 90.0)
    keep = (lat >= box[0]) & (lat <= box[1]) & (lon >= box[2]) & (lon <= box[3])
    out = geo.geo_bounding_box(_ds(df), "c_custkey", "c_acctbal", *box)
    assert int(out["doc_count"].iloc[0]) == int(keep.sum())
    v = df["c_acctbal"].to_numpy()[keep]
    cents = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)
    assert abs(out["value_sum"].iloc[0] - round(cents.sum() / 100.0, 2)) < 1e-9
    # empty box
    z = geo.geo_bounding_box(_ds(df), "c_custkey", "c_acctbal", 89.9, 89.99, 0, 0.01)
    assert int(z["doc_count"].iloc[0]) == 0 and z["value_sum"].iloc[0] == 0.0


def test_geo_grid_cells_hand_math(ray_session):
    df = pd.DataFrame({"c_custkey": np.arange(1, 201, dtype=np.int64)})
    lat, lon = geo.derive_coords(df["c_custkey"].to_numpy())
    cy = np.floor((lat + 90.0) / 45.0).astype(np.int64)
    cx = np.floor((lon + 180.0) / 45.0).astype(np.int64)
    want = pd.DataFrame({"cell_y": cy, "cell_x": cx}).value_counts().reset_index(name="n")
    out = geo.geo_grid(_ds(df), "c_custkey", cell_deg=45.0, size=1000)
    got = {(r.cell_y, r.cell_x): r.doc_count for r in out.itertuples()}
    for r in want.itertuples():
        assert got[(r.cell_y, r.cell_x)] == r.n
    assert out["doc_count"].sum() == 200  # exhaustive, no row lost
    # ordering: count desc then (cell_y, cell_x) asc
    assert out["doc_count"].is_monotonic_decreasing or len(out) <= 1


def test_geo_distance_topk_brute(ray_session):
    df = pd.DataFrame({"c_custkey": np.arange(1, 301, dtype=np.int64)})
    k = df["c_custkey"].to_numpy()
    la = (k * 7919) % 180000 - 90000
    lo = (k * 104729) % 360000 - 180000
    d2 = (la - 45000) ** 2 + (lo - 10000) ** 2
    order = np.lexsort((k, d2))[:10]
    out = geo.geo_distance_topk(_ds(df), "c_custkey", 45000, 10000, k=10)
    assert out["c_custkey"].tolist() == k[order].tolist()
    assert out["dist2_mdeg"].tolist() == d2[order].tolist()
    assert out["rank"].tolist() == list(range(1, 11))


def test_geo_polygon_matches_brute(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.geo import derive_coords, geo_polygon

    poly = [(-120000, -40000), (-20000, -70000), (90000, -20000),
            (60000, 55000), (-80000, 60000)]
    keys = np.arange(1, 400, dtype=np.int64)
    vals = (keys % 97).astype(np.float64) + 0.25
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out = geo_polygon(rd.from_arrow(tbl), "k", "v", poly)

    la = (keys * 7919) % 180000 - 90000
    lo = (keys * 104729) % 360000 - 180000
    inside = np.ones(keys.size, dtype=bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        inside &= (x2 - x1) * (la - y1) - (y2 - y1) * (lo - x1) >= 0
    assert int(out["doc_count"].iloc[0]) == int(inside.sum()) > 0
    cents = np.floor(np.abs(vals[inside]) * 100.0 + 0.5).astype(np.int64)
    assert out["value_sum"].iloc[0] == round(int(cents.sum()) / 100.0, 2)


def test_geo_polygon_rejects_nonconvex():
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.geo import geo_polygon

    cw = [(-80000, 60000), (60000, 55000), (90000, -20000),
          (-20000, -70000), (-120000, -40000)]  # clockwise
    with pytest.raises(ValueError):
        geo_polygon(None, "k", "v", cw)


def test_geo_centroid_exact_mean(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.geo import geo_centroid

    keys = np.arange(1, 200, dtype=np.int64)
    out = geo_centroid(rd.from_arrow(pa.table({"k": pa.array(keys)})), "k")
    la = (keys * 7919) % 180000 - 90000
    lo = (keys * 104729) % 360000 - 180000
    assert int(out["doc_count"].iloc[0]) == keys.size
    assert out["centroid_lat"].iloc[0] == round(la.sum() / keys.size / 1000.0, 6)
    assert out["centroid_lon"].iloc[0] == round(lo.sum() / keys.size / 1000.0, 6)


def test_geo_distance_agg_ring_boundaries(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.geo import geo_distance_agg

    keys = np.arange(1, 300, dtype=np.int64)
    rings = [1_000_000_000, 10_000_000_000]
    out = geo_distance_agg(rd.from_arrow(pa.table({"k": pa.array(keys)})),
                           "k", 0, 0, rings)
    la = (keys * 7919) % 180000 - 90000
    lo = (keys * 104729) % 360000 - 180000
    d2 = la * la + lo * lo
    exp = np.bincount(np.searchsorted(np.array(rings), d2, side="right"),
                      minlength=3)
    assert list(out["ring"]) == [0, 1, 2]
    assert list(out["doc_count"]) == exp.tolist()
    assert int(out["doc_count"].sum()) == keys.size  # rings partition everything


def test_geo_line_truncation_and_multiblock_totals(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.geo import geo_line_agg

    rng = np.random.RandomState(3)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.randint(0, 7, n).astype(np.int64),
        "ts": pd.to_datetime("2026-01-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
    })
    size = 5
    # repartition forces several partial blocks so the min-k partial +
    # sentinel-count merge path is actually exercised
    out = geo_line_agg(rd.from_pandas(df).repartition(6), "user_id", "ts",
                       "event_id", size=size)
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort").head(size)
        keys = g.event_id.to_numpy()
        la = (keys * 7919) % 180000 - 90000
        lo = (keys * 104729) % 360000 - 180000
        exp_line = ";".join(f"{o} {a}" for o, a in zip(lo, la))
        row = out[out.user_id == uid].iloc[0]
        assert row.line == exp_line
        assert row.n_points == len(g)
        assert row.total_points == (df.user_id == uid).sum()
        assert bool(row.complete) == (row.total_points <= size)
    assert list(out.user_id) == sorted(out.user_id)


def test_geo_bounds_envelope(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.geo import geo_bounds_agg

    keys = np.arange(1, 200, dtype=np.int64)
    df = pd.DataFrame({"t": np.where(keys % 2 == 0, "a", "b"), "k": keys})
    out = geo_bounds_agg(rd.from_pandas(df), "t", "k").set_index("t")
    la = (keys * 7919) % 180000 - 90000
    lo = (keys * 104729) % 360000 - 180000
    for t in ("a", "b"):
        m = df.t.to_numpy() == t
        assert out.loc[t, "top_lat"] == la[m].max()
        assert out.loc[t, "bottom_lat"] == la[m].min()
        assert out.loc[t, "left_lon"] == lo[m].min()
        assert out.loc[t, "right_lon"] == lo[m].max()
