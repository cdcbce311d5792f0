"""Highlight stage: kernel semantics, DuckDB-expression parity, and the
store_text serving path (reference: elasticsearch_adapters.py:326-351)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
from hybrid_sanctions_search_engine_ray.pipelines.query import search
from hybrid_sanctions_search_engine_ray.stages.highlight import (
    highlight_corpus,
    highlight_frame,
    highlight_results,
    highlight_sql_expr,
)

TEXTS = [
    "alpha beta gamma delta",
    "Beta, then ALPHA again",         # case folds; alpha after beta
    "nothing relevant here at all",
    "xx" * 50 + " alpha tail case",   # first_pos deep enough to window-clip
    "",                               # empty text
    "пример спарк и мерж по-русски alpha",  # multi-byte chars before a match
]
TERMS = ["alpha", "beta", "spark"]


def _frame():
    return pd.DataFrame({"doc_id": np.arange(len(TEXTS), dtype=np.int64), "text": TEXTS})


def test_kernel_matches_duckdb_expressions():
    df = _frame()
    out = highlight_frame(df, TERMS).sort_values("doc_id").reset_index(drop=True)
    e = highlight_sql_expr(TERMS)
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.execute(
        f"SELECT doc_id, {e['first_pos']} AS first_pos, "
        f"{e['match_terms']} AS match_terms, {e['snippet']} AS snippet "
        f"FROM documents WHERE {e['where']} ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(out, sql, check_dtype=False)


def test_kernel_semantics():
    out = highlight_frame(_frame(), TERMS).set_index("doc_id")
    assert set(out.index) == {0, 1, 3, 5}
    # doc 0: alpha at char 1, window clamps to text start
    assert out.loc[0, "first_pos"] == 1
    assert out.loc[0, "snippet"].startswith("<em>alpha</em> <em>beta</em>")
    assert out.loc[0, "match_terms"] == "alpha,beta"
    # doc 1: beta (lowered) is earliest; both terms marked in snippet
    assert out.loc[1, "first_pos"] == 1
    assert "<em>alpha</em>" in out.loc[1, "snippet"]
    # doc 3: window starts 30 chars before the match, not at text start
    assert out.loc[3, "first_pos"] == 102
    assert out.loc[3, "snippet"].endswith("<em>alpha</em> tail case")
    # doc 5: char (not byte) positions with multi-byte Cyrillic prefix
    assert out.loc[5, "first_pos"] == len("пример спарк и мерж по-русски ") + 1


def test_kernel_empty_cases():
    assert highlight_frame(_frame(), []).empty
    assert highlight_frame(_frame().iloc[:0], TERMS).empty
    assert highlight_frame(_frame(), ["zzznope"]).empty


def test_overlapping_terms_leftmost_longest_first():
    # "scanner" contains both "scan" and "scanner": alternation is
    # ordered longest-first so both engines mark the longer term
    df = pd.DataFrame({"doc_id": [0], "text": ["a scanner darkly"]})
    out = highlight_frame(df, ["scan", "scanner"])
    assert out.loc[0, "snippet"] == "a <em>scanner</em> darkly"
    assert out.loc[0, "match_terms"] == "scan,scanner"


def test_highlight_corpus_streaming(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(_frame(), preserve_index=False))
    out = highlight_corpus(ds, TERMS).to_pandas().sort_values("doc_id")
    ref = highlight_frame(_frame(), TERMS).sort_values("doc_id")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), ref.reset_index(drop=True))


@pytest.fixture(scope="module")
def hl_index(tmp_path_factory, ray_session):
    import ray.data as rd

    rows = [
        {"conv_id": f"c-{i:04d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1)}
        for i, t in enumerate(TEXTS)
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    idx = str(tmp_path_factory.mktemp("hl") / "idx")
    build_index("mem", idx, EngineConfig(num_partitions=4,
                analyzer=AnalyzerConfig(mode="simple")),
                transcripts_ds=ds, store_text=True)
    return idx


def test_highlight_results_serving_path(hl_index, ray_session):
    import ray.data as rd

    res = search(
        rd.from_items([{"query_id": "q", "query_text": "alpha beta", "top_k": 5}]),
        hl_index, EngineConfig(),
    ).to_pandas()
    out = highlight_results(res, hl_index, "alpha beta")
    assert len(out) == len(res)
    hit = out[out["doc_id"] == 0].iloc[0]
    assert "<em>alpha</em>" in hit["snippet"]
    assert hit["match_terms"] == "alpha,beta"


def test_highlight_results_empty_query(hl_index):
    res = pd.DataFrame({"query_id": ["q"], "rank": [1], "doc_id": [0], "score": [1.0]})
    out = highlight_results(res, hl_index, "...")  # analyzes to no terms
    assert out["snippet"].isna().all()
