"""Join strategies (SURVEY.md §2.4).

* :func:`broadcast_join` — the small-side pattern (J2/J3): ``ray.put``
  the dimension table once, map the fact table's batches against it with
  a vectorized pandas merge. No shuffle; the small side ships to each
  actor/worker once via the object store, not per batch.
* For large-large joins the engine uses explicit bucketing
  (hash(key) % B on both sides + per-bucket merge inside map_groups) —
  exercised by the postings shuffle itself; a general helper is
  :func:`bucketed_join`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


class _BroadcastJoiner:
    def __init__(self, small_ref, on: str, how: str):
        self.small = ray.get(small_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def broadcast_join(big_ds, small_df: pd.DataFrame, on: str, how: str = "inner", concurrency: int = 4):
    """Join a big Dataset against a small pandas table without a shuffle."""
    ref = ray.put(small_df)
    return big_ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, on, how),
        batch_format="pandas",
        concurrency=concurrency,
    )


def bucketed_join(left_ds, right_ds, on: str, num_buckets: int = 32, how: str = "inner"):
    """Both-sides-large hash join: bucket each side by ``hash(key) %
    num_buckets`` and merge matching buckets inside ``map_groups``.
    Keys are hashed with a stable function (crc32 via int cast) so
    bucketing is deterministic across processes."""

    left_cols = [c for c in left_ds.schema().names]
    right_cols = [c for c in right_ds.schema().names]
    l_schema = {n: t for n, t in zip(left_ds.schema().names, left_ds.schema().types)}
    r_schema = {n: t for n, t in zip(right_ds.schema().names, right_ds.schema().types)}
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def add_bucket(b: pa.Table, side: str) -> pa.Table:
        keys = b[on].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (keys * 2654435761 % (2**31)) % num_buckets
        cols = {}
        for c in all_cols:
            if c in b.column_names:
                cols[c] = b[c]
            else:
                typ = r_schema.get(c) or l_schema.get(c)
                cols[c] = pa.nulls(len(b), typ)
        t = pa.table(cols)
        t = t.append_column("__bucket", pa.array(bucket.astype(np.int32)))
        return t.append_column("__side", pa.array([side] * len(b), pa.string()))

    tagged = left_ds.map_batches(lambda b: add_bucket(b, "l"), batch_format="pyarrow").union(
        right_ds.map_batches(lambda b: add_bucket(b, "r"), batch_format="pyarrow")
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == "l"][left_cols]
        rf = g[g["__side"] == "r"][right_cols]
        return lf.merge(rf, on=on, how=how)

    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")
