"""Edge-ngram (prefix/autocomplete) analyzer + prefix_search semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.functions.analyzer import (
    EDGE_MAX_GRAM,
    EDGE_MIN_GRAM,
    edge_grams,
    tokenize_edge,
    tokenize_simple,
)
from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms


def test_edge_grams_basic():
    assert edge_grams("spark") == ["sp", "spa", "spar", "spark"]
    assert edge_grams("a") == ["a"]
    assert edge_grams("ab") == ["ab"]
    long = "x" * 30
    assert edge_grams(long)[-1] == "x" * EDGE_MAX_GRAM
    assert len(edge_grams(long)) == EDGE_MAX_GRAM - EDGE_MIN_GRAM + 1


@pytest.mark.parametrize(
    "text",
    [
        "Spark JOIN filter",
        "иванов и данные",
        "a bb ccc dddd",
        "",
        "the the the",  # repeats collapse (distinct set)
    ],
)
def test_edge_flat_matches_python(text):
    expect_per_doc = set(tokenize_edge(text))
    parent, terms = flat_terms(
        pa.table({"text": pa.array([text, "other words"], pa.string())}),
        AnalyzerConfig(mode="edge"),
    )
    got = {t for p, t in zip(parent, terms.to_pylist()) if p == 0}
    assert got == expect_per_doc
    # distinctness: no (doc, gram) pair twice
    pairs = list(zip(parent.tolist(), terms.to_pylist()))
    assert len(pairs) == len(set(pairs))


def test_edge_python_analyzer_sorted_distinct():
    out = tokenize_edge("spark spark spa")
    assert out == sorted(set(out))
    assert "sp" in out and "spark" in out


@pytest.fixture(scope="module")
def edge_index(tmp_path_factory, corpus_dir):
    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index

    cfg = EngineConfig(num_partitions=8, analyzer=AnalyzerConfig(mode="edge"))
    index_dir = str(tmp_path_factory.mktemp("eidx") / "idx")
    build_index(corpus_dir, index_dir, cfg)
    return index_dir


def test_prefix_search_retrieves_by_prefix(edge_index, corpus_dir):
    import pyarrow.dataset as pads

    from hybrid_sanctions_search_engine_ray.pipelines.query import prefix_search

    tbl = pads.dataset(corpus_dir).to_table(columns=["conv_id", "turn_idx", "text"]).to_pandas()
    tbl = tbl.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # brute truth: docs where some token starts with every query prefix
    def brute(query: str) -> set[int]:
        prefixes = tokenize_simple(query)
        hits = set()
        for i, text in enumerate(tbl["text"]):
            toks = tokenize_simple(text)
            if all(any(t.startswith(p) and len(p) >= 1 for t in toks) for p in prefixes):
                hits.add(i)
        return hits

    qs = rd.from_pandas(
        pd.DataFrame(
            {
                "query_id": ["p1", "p2", "p3"],
                "query_text": ["tok0004", "tok0004 paymen", "иван"],
                "top_k": [1000, 1000, 1000],
            }
        )
    )
    out = prefix_search(qs, edge_index).to_pandas()
    got1 = set(out.loc[out.query_id == "p1", "doc_id"].astype(int))
    got2 = set(out.loc[out.query_id == "p2", "doc_id"].astype(int))
    got3 = set(out.loc[out.query_id == "p3", "doc_id"].astype(int))
    b1, b2, b3 = brute("tok0004"), brute("tok0004 paymen"), brute("иван")
    for got, b in ((got1, b1), (got2, b2), (got3, b3)):
        if len(b) <= 1000:
            assert got == b
        else:  # top-k clamp: ranked subset only
            assert got <= b and len(got) == 1000
    assert len(got1) > 0
    assert got2 <= got1  # conjunctive


def test_prefix_longer_than_max_gram_misses(edge_index):
    from hybrid_sanctions_search_engine_ray.pipelines.query import prefix_search

    # 25-char prefix exceeds EDGE_MAX_GRAM=20 → not indexed → no hits
    qs = rd.from_items([{"query_id": "px", "query_text": "x" * 25, "top_k": 10}])
    assert prefix_search(qs, edge_index).count() == 0
