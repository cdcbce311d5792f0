"""ES nested-document family (stages/nested_docs.py): the nested query's
per-nested-doc conjunction and the nested/reverse_nested terms agg —
checked against brute-force pandas on small in-memory Datasets."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hybrid_sanctions_search_engine_ray.stages.nested_docs import (
    nested_query,
    nested_terms_agg,
)


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df)


@pytest.fixture(scope="module")
def child_df(ray_session):
    rng = np.random.RandomState(11)
    n = 500
    return pd.DataFrame(
        {
            "user_id": rng.randint(0, 40, n).astype(np.int64),
            "event_type": rng.choice(["click", "purchase", "view"], n),
            "value": np.round(rng.uniform(0, 300, n), 2),
        }
    )


def test_nested_query_conjunction_is_per_row(child_df):
    out = nested_query(_ds(child_df), "user_id", "event_type", "purchase",
                       "value", 50.0, 200.0, min_children=2)
    m = child_df[(child_df.event_type == "purchase")
                 & (child_df.value >= 50.0) & (child_df.value < 200.0)]
    cents = (np.floor(m.value.to_numpy() * 100.0 + 0.5)).astype(np.int64)
    g = pd.DataFrame({"user_id": m.user_id.to_numpy(), "c": cents}) \
        .groupby("user_id")["c"].agg(n="size", mx="max", sm="sum")
    g = g[g.n >= 2]
    assert set(out.user_id) == set(g.index)
    for _, r in out.iterrows():
        assert r.n_matched == g.loc[r.user_id, "n"]
        assert r.max_value == pytest.approx(g.loc[r.user_id, "mx"] / 100.0)
        assert r.sum_value == pytest.approx(g.loc[r.user_id, "sm"] / 100.0)
    # deterministic ES order: n_matched desc, parent asc
    key = list(zip(-out.n_matched, out.user_id))
    assert key == sorted(key)


def test_nested_query_differs_from_flattened_or(child_df):
    """A user with a 'purchase' below the range AND a non-purchase inside
    the range must NOT match — the cross-object pitfall the nested query
    exists to avoid. Construct one explicitly."""
    df = pd.DataFrame(
        {
            "user_id": np.array([900, 900, 901, 901], dtype=np.int64),
            "event_type": ["purchase", "view", "purchase", "purchase"],
            "value": [10.0, 100.0, 100.0, 120.0],
        }
    )
    out = nested_query(_ds(df), "user_id", "event_type", "purchase",
                       "value", 50.0, 200.0, min_children=1)
    assert list(out.user_id) == [901]
    assert list(out.n_matched) == [2]


def test_nested_terms_agg_reverse_nested_counts(child_df):
    out = nested_terms_agg(_ds(child_df), "user_id", "event_type",
                           "value", 150.0)
    m = child_df[child_df.value >= 150.0]
    exp = m.groupby("event_type").agg(
        doc_count=("user_id", "size"), parent_count=("user_id", "nunique"))
    assert set(out.event_type) == set(exp.index)
    for _, r in out.iterrows():
        assert r.doc_count == exp.loc[r.event_type, "doc_count"]
        assert r.parent_count == exp.loc[r.event_type, "parent_count"]
    assert list(out.doc_count) == sorted(out.doc_count, reverse=True)


def test_nested_empty_result_schemas(ray_session):
    df = pd.DataFrame({"user_id": np.array([1], dtype=np.int64),
                       "event_type": ["view"], "value": [5.0]})
    q = nested_query(_ds(df), "user_id", "event_type", "purchase",
                     "value", 50.0, 200.0)
    assert len(q) == 0 and list(q.columns) == [
        "user_id", "n_matched", "max_value", "sum_value"]
    a = nested_terms_agg(_ds(df), "user_id", "event_type", "value", 100.0)
    assert len(a) == 0 and list(a.columns) == [
        "event_type", "doc_count", "parent_count"]
