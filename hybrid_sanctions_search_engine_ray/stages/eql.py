"""EQL-style sequence detection over an event log.

Elasticsearch's Event Query Language (`EQL search API
<https://www.elastic.co/guide/en/elasticsearch/reference/current/eql.html>`_)
matches ordered multi-step patterns per join key::

    sequence by user_id with maxspan=30m
      [ event where event_type == "signup"   ]
      [ event where event_type == "purchase" ]
      [ event where event_type == "error"    ]

This module re-expresses that as ONE key shuffle (``groupby(by)``) with
a vectorized per-group chain: each group's events are split into
per-step arrays sorted by ``(ts, id)`` and the chain advances with
``np.searchsorted`` — step *i+1*'s match is the EARLIEST event strictly
after step *i*'s timestamp (ties on ts broken by ascending id).

Semantics note (documented simplification): ES's engine is a consuming
state machine — once an event completes a sequence it cannot serve
another in-flight one. Here matching is **non-consuming and
earliest-follower deterministic**: every step-1 event anchors its own
candidate chain, and one follower event may close several anchors. This
keeps the operator retry/batching-invariant and exactly SQL-twinnable
(each hop is a `LEFT JOIN LATERAL ... ORDER BY ts, id LIMIT 1`), the
repo-wide contract. Anchors whose chain leaves the ``maxspan`` window
(first→last step) are dropped, as in ES.

Scale shape: intermediate events never leave their group — only rows
matching some step are shuffled (pre-filtered before the groupby), and
the per-group work is O(n log n). Hot join keys (one user with millions
of events) are the same skew exposure as sessionize/gap_stats; salt by
time-bucket if a key exceeds a block.

Reference analog: the ES EQL sequence engine; no counterpart in the
reference repo's Python layers (it delegates to ES).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def eql_sequence_group(g: pd.DataFrame, steps: list[str], maxspan_us: int | None,
                       by: str, ts_col: str, id_col: str, type_col: str) -> pd.DataFrame:
    """One key's events → one row per completed earliest-follower chain."""
    n_steps = len(steps)
    cols = {f"e{i + 1}_id": pd.Series([], dtype=np.int64) for i in range(n_steps)}
    empty = pd.DataFrame({by: pd.Series([], dtype=g[by].dtype), **cols,
                          "start_us": pd.Series([], dtype=np.int64),
                          "end_us": pd.Series([], dtype=np.int64),
                          "span_us": pd.Series([], dtype=np.int64)})
    g = g.sort_values([ts_col, id_col], kind="mergesort")
    ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    ids = g[id_col].to_numpy().astype(np.int64)
    et = g[type_col].to_numpy()

    step_ts, step_ids = [], []
    for s in steps:
        m = et == s
        if not m.any():
            return empty
        step_ts.append(ts[m])
        step_ids.append(ids[m])

    cur_ts = step_ts[0]
    anchor_ids = step_ids[0]
    valid = np.ones(cur_ts.size, dtype=bool)
    hop_ids = [anchor_ids]
    for s in range(1, n_steps):
        # earliest event of step s strictly after the current chain ts;
        # arrays are (ts, id)-sorted so side="right" lands on the
        # min-(ts, id) qualifying follower.
        idx = np.searchsorted(step_ts[s], cur_ts, side="right")
        valid &= idx < step_ts[s].size
        idx = np.minimum(idx, step_ts[s].size - 1)
        cur_ts = step_ts[s][idx]
        hop_ids.append(step_ids[s][idx])
    start = step_ts[0]
    if maxspan_us is not None:
        valid &= (cur_ts - start) <= maxspan_us
    if not valid.any():
        return empty
    out = {by: np.repeat(g[by].iloc[0], int(valid.sum()))}
    for i, h in enumerate(hop_ids):
        out[f"e{i + 1}_id"] = h[valid]
    out["start_us"] = start[valid]
    out["end_us"] = cur_ts[valid]
    out["span_us"] = cur_ts[valid] - start[valid]
    return pd.DataFrame(out)


def eql_sequence(events_ds, steps: list[str], maxspan_s: float | None = None,
                 by: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id", type_col: str = "event_type"):
    """`sequence by <by> with maxspan [steps...]` over a Dataset.

    Returns one row per completed chain: ``(by, e1_id..eN_id, start_us,
    end_us, span_us)``. Events matching no step are filtered out BEFORE
    the key shuffle so only candidate rows move.
    """
    if len(steps) < 2:
        raise ValueError("eql_sequence needs >= 2 steps")
    maxspan_us = None if maxspan_s is None else int(round(maxspan_s * 1_000_000))

    import pyarrow as pa
    import pyarrow.compute as pc

    def prefilter(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[type_col], value_set=pa.array(steps)))

    return (
        events_ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby(by)
        .map_groups(
            lambda g: eql_sequence_group(g, steps, maxspan_us, by, ts_col, id_col, type_col),
            batch_format="pandas",
        )
    )
