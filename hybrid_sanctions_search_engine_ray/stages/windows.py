"""Streaming-shaped operators over ordered event logs: tumbling windows
and gap-based sessionization.

Ray Data has no event-time windows (SURVEY.md §2.9 — neither does the
reference); the batch re-expression treats the log as a partitioned,
ts-sortable table: tumbling windows are a pure key derivation
(``floor(epoch/size)``) followed by the partial-agg + small-groupby
pattern; sessions are ``groupby(key).map_groups`` over ts-sorted groups
with a vectorized gap cut (no per-row Python).

Ordering assumption: session correctness requires all events of one
``user_id`` in one group — guaranteed by the groupby shuffle; within the
group we sort by ts explicitly, so input order is free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tumbling_window_key(ts_us: np.ndarray, window_s: int) -> np.ndarray:
    """Epoch-second window start per event (matches DuckDB
    ``floor(epoch(ts)/w)*w`` for non-negative timestamps)."""
    return (ts_us // (window_s * 1_000_000)) * window_s


def hopping_window_keys(ts_us: np.ndarray, window_s: int, hop_s: int) -> tuple[np.ndarray, np.ndarray]:
    """Hopping (sliding) windows: size ``window_s``, advancing every
    ``hop_s`` (must divide the size). Each event falls in exactly
    ``window_s/hop_s`` windows; returns (row_index, window_start_s)
    flat pairs — the vectorized per-window emit (np.repeat + grid
    offsets, no Python loop) that feeds the same partial-agg + small
    groupby pattern as tumbling windows. The fan-out factor k is a
    constant, so the emitted stream is k× the input — still streaming,
    never materialized."""
    if window_s % hop_s != 0:
        raise ValueError("hop_s must divide window_s")
    k = window_s // hop_s
    base = (ts_us // (hop_s * 1_000_000)) * hop_s  # last grid start <= t
    starts = base[:, None] - (np.arange(k, dtype=np.int64) * hop_s)[None, :]
    rows = np.repeat(np.arange(ts_us.size, dtype=np.int64), k)
    return rows, starts.reshape(-1)


def sessionize_group(g: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    """One user's events → one row per session: a new session starts
    whenever the gap since the previous event exceeds ``gap_s``.
    Vectorized: diff + cumsum over the ts-sorted group."""
    g = g.sort_values("ts", kind="mergesort")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    gap_us = gap_s * 1_000_000
    new_session = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
    sid = np.cumsum(new_session) - 1
    out = (
        pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "session_idx": sid,
                "ts_us": ts,
                "value": g["value"].to_numpy(),
            }
        )
        .groupby("session_idx", sort=True)
        .agg(
            user_id=("user_id", "first"),
            session_start_us=("ts_us", "min"),
            session_end_us=("ts_us", "max"),
            n_events=("ts_us", "size"),
            sum_value=("value", "sum"),
        )
        .reset_index()
    )
    out["session_idx"] = out["session_idx"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out[["user_id", "session_idx", "session_start_us", "session_end_us", "n_events", "sum_value"]]


def sessionize(events_ds, gap_s: int = 1800, concurrency: int | None = None):
    """Dataset(user_id, ts, value) → one row per (user, session)."""
    return events_ds.groupby("user_id").map_groups(
        lambda g: sessionize_group(g, gap_s), batch_format="pandas"
    )
