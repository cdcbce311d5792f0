"""ES geo-query family (geo_bounding_box filter, geohash_grid-style
cell aggregation) over DERIVED deterministic coordinates.

The test tables carry no geo columns, so coordinates derive from an
integer key by pure int64 arithmetic (``(key·P) mod R`` scaled into
degree ranges) — the derivation is part of the operator contract and
is shared verbatim with the SQL twin, making every comparison and cell
assignment bit-exact (no transcendentals anywhere: the grid uses
equal-DEGREE cells, the geohash_grid analog, rather than Web-Mercator
geotiles whose ln/tan would put a 1-ulp libm difference under a floor).

Reference surface: the ES geo queries (`geo_bounding_box`,
`geohash_grid`) in the public query DSL; the reference itself is
text-only, so this family is part of the engine-completeness axis, not
reference parity.

Scale shape: both operators are pure per-batch map work; only the grid
shuffles, and only (cell, partial-count) rows — cells, never rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_LAT_P, _LON_P = 7919, 104729  # primes; spread keys over the globe


def derive_coords(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) doubles from an int64 key — exact int64 arithmetic
    then ONE division, identical op-for-op with the SQL twin."""
    k = keys.astype(np.int64)
    lat = ((k * _LAT_P) % 180000) / 1000.0 - 90.0
    lon = ((k * _LON_P) % 360000) / 1000.0 - 180.0
    return lat, lon


def geo_bounding_box(ds, key_col: str, value_col: str,
                     lat_min: float, lat_max: float,
                     lon_min: float, lon_max: float) -> pd.DataFrame:
    """ES ``geo_bounding_box`` (as a filter + stats): rows whose derived
    point falls inside the box; returns count + exact integer cent-sum
    of ``value_col``. One streaming pass, scalar result."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_coords(b[key_col].to_numpy(zero_copy_only=False))
        keep = (lat >= lat_min) & (lat <= lat_max) & \
               (lon >= lon_min) & (lon <= lon_max)
        v = b[value_col].to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(np.abs(v) * 100.0 + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        return pa.table({"n_p": pa.array([int(keep.sum())], pa.int64()),
                         "c_p": pa.array([int(cents.sum())], pa.int64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n_p", alias_name="doc_count"),
                   Sum("c_p", alias_name="cents"))
        .to_pandas()
    )
    n = int(agg["doc_count"].iloc[0]) if len(agg) else 0
    c = int(agg["cents"].iloc[0]) if len(agg) else 0
    return pd.DataFrame({"doc_count": pd.Series([n], dtype=np.int64),
                         "value_sum": [round(c / 100.0, 2)]})


def geo_grid(ds, key_col: str, cell_deg: float = 22.5,
             size: int = 10) -> pd.DataFrame:
    """ES ``geohash_grid``-style aggregation with equal-degree cells:
    cell = (floor((lat+90)/cell_deg), floor((lon+180)/cell_deg)), count
    per cell, top ``size`` by (count desc, cell asc). Per-batch partial
    counts → a cells-sized shuffle."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_coords(b[key_col].to_numpy(zero_copy_only=False))
        cy = np.floor((lat + 90.0) / cell_deg).astype(np.int64)
        cx = np.floor((lon + 180.0) / cell_deg).astype(np.int64)
        t = pa.table({"cell_y": pa.array(cy), "cell_x": pa.array(cx)})
        g = t.group_by(["cell_y", "cell_x"]).aggregate([([], "count_all")])
        return pa.table({"cell_y": g["cell_y"], "cell_x": g["cell_x"],
                         "c_p": pc.cast(g["count_all"], pa.int64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cell_y", "cell_x"])
        .aggregate(Sum("c_p", alias_name="doc_count"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"cell_y": pd.Series([], dtype=np.int64),
                             "cell_x": pd.Series([], dtype=np.int64),
                             "doc_count": pd.Series([], dtype=np.int64)})
    agg = agg.sort_values(["doc_count", "cell_y", "cell_x"],
                          ascending=[False, True, True],
                          kind="mergesort").head(size).reset_index(drop=True)
    return pd.DataFrame({"cell_y": agg["cell_y"].astype(np.int64),
                         "cell_x": agg["cell_x"].astype(np.int64),
                         "doc_count": agg["doc_count"].astype(np.int64)})


def geo_distance_topk(ds, key_col: str, lat_md: int, lon_md: int,
                      k: int = 10) -> pd.DataFrame:
    """ES ``geo_distance`` sort (planar small-region approximation kept
    EXACT: squared euclidean distance in integer milli-degrees — int64
    arithmetic end-to-end, where true haversine's sin/asin would put a
    libm ulp into the sort key): top-``k`` rows nearest the origin
    point, ties by key. Per-batch partial top-k → one tiny driver merge
    (the brute-force-topk pattern)."""

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        la = (keys * _LAT_P) % 180000 - 90000
        lo = (keys * _LON_P) % 360000 - 180000
        d2 = (la - lat_md) ** 2 + (lo - lon_md) ** 2
        top = np.lexsort((keys, d2))[:k]
        return pa.table({key_col: pa.array(keys[top]),
                         "dist2_mdeg": pa.array(d2[top])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["dist2_mdeg", key_col],
                              kind="mergesort").head(k).reset_index(drop=True)
    return pd.DataFrame({
        key_col: parts[key_col].astype(np.int64),
        "rank": np.arange(1, len(parts) + 1, dtype=np.int32),
        "dist2_mdeg": parts["dist2_mdeg"].astype(np.int64),
    })


def geo_polygon(ds, key_col: str, value_col: str,
                vertices_md: list[tuple[int, int]]) -> pd.DataFrame:
    """ES ``geo_polygon`` filter (+ stats), kept bit-exact: the polygon
    is CONVEX with vertices in (lon, lat) integer milli-degrees, CCW
    order, and membership is the all-edges half-plane test
    ``cross(v2-v1, p-v1) >= 0`` (boundary inclusive) — pure int64
    arithmetic (|cross| < 360000² ≪ 2^63), no trigonometry, shared
    op-for-op with the SQL twin. One streaming pass, scalar partials,
    no shuffle beyond the global sum."""
    from ray.data.aggregate import Sum

    vx = np.array([v[0] for v in vertices_md], dtype=np.int64)
    vy = np.array([v[1] for v in vertices_md], dtype=np.int64)
    ex, ey = np.roll(vx, -1) - vx, np.roll(vy, -1) - vy
    # refuse non-convex/clockwise input up front: every consecutive
    # edge turn must be a left turn
    turns = ex * np.roll(ey, -1) - ey * np.roll(ex, -1)
    if (turns <= 0).any():
        raise ValueError("vertices_md must be a convex polygon in CCW order")

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        la = (keys * _LAT_P) % 180000 - 90000
        lo = (keys * _LON_P) % 360000 - 180000
        inside = np.ones(keys.size, dtype=bool)
        for i in range(vx.size):
            cross = ex[i] * (la - vy[i]) - ey[i] * (lo - vx[i])
            inside &= cross >= 0
        v = b[value_col].to_numpy(zero_copy_only=False)[inside]
        cents = np.floor(np.abs(v) * 100.0 + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        return pa.table({"n_p": pa.array([int(inside.sum())], pa.int64()),
                         "c_p": pa.array([int(cents.sum())], pa.int64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n_p", alias_name="doc_count"),
                   Sum("c_p", alias_name="cents"))
        .to_pandas()
    )
    n = int(agg["doc_count"].iloc[0]) if len(agg) else 0
    c = int(agg["cents"].iloc[0]) if len(agg) else 0
    return pd.DataFrame({"doc_count": pd.Series([n], dtype=np.int64),
                         "value_sum": [round(c / 100.0, 2)]})


def geo_centroid(ds, key_col: str) -> pd.DataFrame:
    """ES ``geo_centroid``: arithmetic mean of the derived points,
    kept exact by summing integer milli-degrees and dividing ONCE at
    the end (matching the SQL twin op-for-op). One streaming pass,
    scalar partials."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        la = (keys * _LAT_P) % 180000 - 90000
        lo = (keys * _LON_P) % 360000 - 180000
        return pa.table({"n_p": pa.array([keys.size], pa.int64()),
                         "la_p": pa.array([int(la.sum())], pa.int64()),
                         "lo_p": pa.array([int(lo.sum())], pa.int64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n_p", alias_name="n"),
                   Sum("la_p", alias_name="la"),
                   Sum("lo_p", alias_name="lo"))
        .to_pandas()
    )
    if (agg.empty or "n" not in agg.columns
            or agg["n"].iloc[0] is None or pd.isna(agg["n"].iloc[0])
            or int(agg["n"].iloc[0]) == 0):
        # empty dataset: no centroid (code-review r05 finding)
        return pd.DataFrame({"doc_count": pd.Series([0], dtype=np.int64),
                             "centroid_lat": [float("nan")],
                             "centroid_lon": [float("nan")]})
    n = int(agg["n"].iloc[0])
    return pd.DataFrame({
        "doc_count": pd.Series([n], dtype=np.int64),
        "centroid_lat": [round(int(agg["la"].iloc[0]) / n / 1000.0, 6)],
        "centroid_lon": [round(int(agg["lo"].iloc[0]) / n / 1000.0, 6)],
    })


def geo_distance_agg(ds, key_col: str, lat_md: int, lon_md: int,
                     rings_mdeg2: list[int]) -> pd.DataFrame:
    """ES ``geo_distance`` aggregation (concentric ring buckets): counts
    per squared-planar-distance ring, integer milli-degree d² end-to-end
    (the geo family's no-libm rule — true haversine's sin/asin would put
    an ulp under the bucket boundary). ``rings_mdeg2`` are the ring
    upper bounds; a final unbounded ring collects the rest. Per-batch
    digitize partials → ring-count-sized groupby."""
    from ray.data.aggregate import Sum

    bounds = np.asarray(rings_mdeg2, dtype=np.int64)
    if bounds.size and not (np.diff(bounds) > 0).all():
        # searchsorted is undefined on unsorted bounds — wrong ring
        # assignment with no error (code-review r05 finding)
        raise ValueError("geo_distance_agg: rings_mdeg2 must be strictly "
                         "increasing")

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        la = (keys * _LAT_P) % 180000 - 90000
        lo = (keys * _LON_P) % 360000 - 180000
        d2 = (la - lat_md) ** 2 + (lo - lon_md) ** 2
        ring = np.searchsorted(bounds, d2, side="right").astype(np.int64)
        cnt = np.bincount(ring, minlength=bounds.size + 1)
        return pa.table({"ring": pa.array(np.arange(bounds.size + 1, dtype=np.int64)),
                         "c_p": pa.array(cnt.astype(np.int64))})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ring")
        .aggregate(Sum("c_p", alias_name="doc_count"))
        .to_pandas()
        .sort_values("ring")
        .reset_index(drop=True)
    )
    return pd.DataFrame({"ring": agg["ring"].astype(np.int64),
                         "doc_count": agg["doc_count"].astype(np.int64)})


def geo_line_agg(ds, group_col: str, ts_col: str, key_col: str,
                 size: int = 25) -> pd.DataFrame:
    """ES ``geo_line`` aggregation: per group, the track of derived
    points ordered by timestamp, truncated to the first ``size`` points
    (the ES ``size`` cap; ``include_sort`` order asc). Coordinates are
    integer milli-degrees (the geo family's no-libm rule) rendered as
    "lonmd latmd" pairs joined with ";" so the line string is bit-exact
    against the SQL twin.

    Returns (group, n_points, total_points, complete, line) ordered by
    group. Scale shape: ES caps ``size`` ≤ 10k and so do we — a
    per-batch partial keeps only the ``size`` earliest (ts, key) rows
    per group, so the ONE exchange carries ≤ groups × size point rows
    plus a per-group count sentinel, never the raw table. The final
    per-group merge re-sorts ≤ n_blocks × size rows."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # earliest `size` rows per group within the batch
        order = np.lexsort((keys, ts, g))
        gs, tss, ks = g[order], ts[order], keys[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        rank = np.arange(gs.size) - np.repeat(starts, np.diff(np.r_[starts, gs.size]))
        keep = rank < size
        la = (ks[keep] * _LAT_P) % 180000 - 90000
        lo = (ks[keep] * _LON_P) % 360000 - 180000
        # per-group total counts ride along as sentinel rows (ts = -1)
        u, c = gs[starts], np.diff(np.r_[starts, gs.size])
        return pa.table({
            group_col: pa.array(np.r_[gs[keep], u]),
            # sentinel = int64 min: -1 collided with legitimate
            # pre-epoch timestamps (code-review r05 finding)
            "ts_us": pa.array(np.r_[tss[keep], np.full(u.size, np.iinfo(np.int64).min, dtype=np.int64)]),
            "k": pa.array(np.r_[ks[keep], np.zeros(u.size, dtype=np.int64)]),
            "lat_md": pa.array(np.r_[la, np.zeros(u.size, dtype=np.int64)]),
            "lon_md": pa.array(np.r_[lo, np.zeros(u.size, dtype=np.int64)]),
            "cnt": pa.array(np.r_[np.zeros(int(keep.sum()), dtype=np.int64), c.astype(np.int64)]),
        })

    def finish(gdf: pd.DataFrame) -> pd.DataFrame:
        total = int(gdf["cnt"].sum())
        pts = gdf[gdf["ts_us"] != np.iinfo(np.int64).min].sort_values(["ts_us", "k"], kind="mergesort").head(size)
        line = ";".join(f"{int(lo)} {int(la)}"
                        for lo, la in zip(pts["lon_md"], pts["lat_md"]))
        return pd.DataFrame({group_col: [int(gdf[group_col].iloc[0])],
                             "n_points": [len(pts)],
                             "total_points": [total],
                             "complete": [total <= size],
                             "line": [line]})

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(group_col)
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({group_col: pd.Series([], dtype=np.int64),
                             "n_points": pd.Series([], dtype=np.int64),
                             "total_points": pd.Series([], dtype=np.int64),
                             "complete": pd.Series([], dtype=bool),
                             "line": pd.Series([], dtype=object)})
    out = out.sort_values(group_col, kind="mergesort").reset_index(drop=True)
    out["n_points"] = out["n_points"].astype(np.int64)
    out["total_points"] = out["total_points"].astype(np.int64)
    return out


def geo_bounds_agg(ds, key_col: str, point_key_col: str) -> pd.DataFrame:
    """ES ``geo_bounds``: per ``key_col`` bucket, the smallest bounding
    box enclosing every derived point — integer milli-degree min/max
    (top-left = max lat / min lon, bottom-right = min lat / max lon, the
    ES corner convention). Per-batch partial extrema → keys-sized
    shuffle."""
    from ray.data.aggregate import Max, Min

    def partial(b: pa.Table) -> pa.Table:
        keys = b[point_key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        la = (keys * _LAT_P) % 180000 - 90000
        lo = (keys * _LON_P) % 360000 - 180000
        df = pd.DataFrame({key_col: b[key_col].to_pandas(), "la": la, "lo": lo})
        g = df.groupby(key_col, sort=False).agg(
            la_min=("la", "min"), la_max=("la", "max"),
            lo_min=("lo", "min"), lo_max=("lo", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(key_col)
        .aggregate(Min("la_min", alias_name="bottom_lat"),
                   Max("la_max", alias_name="top_lat"),
                   Min("lo_min", alias_name="left_lon"),
                   Max("lo_max", alias_name="right_lon"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "top_lat": pd.Series([], dtype=np.int64),
                             "left_lon": pd.Series([], dtype=np.int64),
                             "bottom_lat": pd.Series([], dtype=np.int64),
                             "right_lon": pd.Series([], dtype=np.int64)})
    agg = agg.sort_values(key_col, kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({key_col: agg[key_col],
                         "top_lat": agg["top_lat"].astype(np.int64),
                         "left_lon": agg["left_lon"].astype(np.int64),
                         "bottom_lat": agg["bottom_lat"].astype(np.int64),
                         "right_lon": agg["right_lon"].astype(np.int64)})


def geo_pairs(ds, key_col: str, max_dist_milli: int = 3000):
    """Distance self-join: all point pairs within ``max_dist_milli``
    (planar squared euclidean in integer milli-degrees — int64
    end-to-end, bit-exact; no wraparound at the ±180° seam, documented
    like the rest of the integer-geo family).

    This is the catalog's SPATIAL-JOIN shuffle pattern: grid-bucket +
    neighbor-cell replication. Each point lands in cell
    ``(la // C, lo // C)`` with C = max_dist and is REPLICATED into the
    8 neighbor cells (9 rows per point — the bounded fan-out that makes
    the join local); a pair (a, b), a < b, is emitted exactly once: in
    a's home cell, where b is guaranteed present because |Δcell| ≤ 1
    when dist ≤ C. One (cell)-keyed exchange of 9× the point rows —
    never an all-pairs shuffle; within a cell the candidate test is one
    vectorized home×visitors distance matrix. Skew: a cell holds only
    points within one C-box; a pathological hot box would salt by key
    range with anchor-side replication.

    Returns (key_a, key_b, d2) with key_a < key_b.
    """
    import pyarrow as _pa

    C = int(max_dist_milli)
    D2 = C * C

    def replicate(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        la = (k * _LAT_P) % 180000   # keep the non-negative shifted plane
        lo = (k * _LON_P) % 360000
        cy, cx = la // C, lo // C
        n = k.size
        reps = 9
        kk = np.tile(k, reps)
        laa = np.tile(la, reps)
        loo = np.tile(lo, reps)
        cyy = np.empty(n * reps, dtype=np.int64)
        cxx = np.empty(n * reps, dtype=np.int64)
        home = np.zeros(n * reps, dtype=bool)
        i = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                cyy[i * n:(i + 1) * n] = cy + dy
                cxx[i * n:(i + 1) * n] = cx + dx
                if dy == 0 and dx == 0:
                    home[i * n:(i + 1) * n] = True
                i += 1
        return _pa.table({
            "cy": _pa.array(cyy), "cx": _pa.array(cxx),
            "k": _pa.array(kk), "la": _pa.array(laa), "lo": _pa.array(loo),
            "home": _pa.array(home),
        })

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"key_a": pd.Series([], dtype=np.int64),
                              "key_b": pd.Series([], dtype=np.int64),
                              "d2": pd.Series([], dtype=np.int64)})
        h = g[g["home"].to_numpy()]
        if len(h) == 0 or len(g) < 2:
            return empty
        ka = h["k"].to_numpy().astype(np.int64)
        kb = g["k"].to_numpy().astype(np.int64)
        dla = h["la"].to_numpy().astype(np.int64)[:, None] - g["la"].to_numpy().astype(np.int64)[None, :]
        dlo = h["lo"].to_numpy().astype(np.int64)[:, None] - g["lo"].to_numpy().astype(np.int64)[None, :]
        d2 = dla * dla + dlo * dlo
        ok = (d2 <= D2) & (ka[:, None] < kb[None, :])
        ai, bi = np.nonzero(ok)
        if ai.size == 0:
            return empty
        return pd.DataFrame({"key_a": ka[ai], "key_b": kb[bi],
                             "d2": d2[ai, bi].astype(np.int64)})

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby(["cy", "cx"])
        .map_groups(cell_pairs, batch_format="pandas")
    )
