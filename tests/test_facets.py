"""Facet counts over the full matching set (ES aggregations shape)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader
from hybrid_sanctions_search_engine_ray.stages.facets import (
    facet_counts_ds,
    matching_doc_ids,
    search_facets,
)

TEXTS = [
    ("alpha beta", "user"),
    ("beta gamma", "assistant"),
    ("gamma delta", "user"),
    ("alpha alpha", "assistant"),
    ("unrelated words", "tool"),
]


@pytest.fixture(scope="module")
def facet_index(tmp_path_factory, ray_session):
    import ray.data as rd

    rows = [
        {"conv_id": f"c-{i:04d}", "turn_idx": 0, "role": role, "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1)}
        for i, (t, role) in enumerate(TEXTS)
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    idx = str(tmp_path_factory.mktemp("facet") / "idx")
    build_index("mem", idx, EngineConfig(num_partitions=4,
                analyzer=AnalyzerConfig(mode="simple")), transcripts_ds=ds)
    return idx


def _meta_ds():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "role": pa.array([r for _, r in TEXTS], pa.string()),
    }))


def test_matching_is_or_union(facet_index):
    r = IndexReader(facet_index)
    assert matching_doc_ids(r, "alpha gamma").tolist() == [0, 1, 2, 3]
    assert matching_doc_ids(r, "delta").tolist() == [2]
    assert matching_doc_ids(r, "").size == 0
    assert matching_doc_ids(r, "zzznope").size == 0


def test_search_facets_counts(facet_index, ray_session):
    out = search_facets(facet_index, "alpha gamma", _meta_ds(), facet_col="role")
    assert dict(zip(out["facet"], out["n_docs"])) == {"user": 2, "assistant": 2}
    # sorted count desc then facet asc
    assert list(out["facet"]) == ["assistant", "user"]
    empty = search_facets(facet_index, "zzznope", _meta_ds(), facet_col="role")
    assert empty.empty and list(empty.columns) == ["facet", "n_docs"]


def test_facets_exclude_tombstones(facet_index, ray_session, tmp_path):
    import shutil

    from hybrid_sanctions_search_engine_ray.pipelines.maintenance import delete_docs

    idx2 = str(tmp_path / "idx2")
    shutil.copytree(facet_index, idx2)
    delete_docs(idx2, [0, 3])  # both 'alpha' docs
    out = search_facets(idx2, "alpha gamma", _meta_ds(), facet_col="role")
    assert dict(zip(out["facet"], out["n_docs"])) == {"user": 1, "assistant": 1}


def test_facet_counts_ds_membership(ray_session):
    ids = np.array([1, 3], dtype=np.int64)
    out = facet_counts_ds(_meta_ds(), ids, "role")
    assert dict(zip(out["facet"], out["n_docs"])) == {"assistant": 2}
    none = facet_counts_ds(_meta_ds(), np.empty(0, dtype=np.int64), "role")
    assert none.empty


def test_significant_terms_query_terms_rank_top(facet_index):
    """The query's own terms are maximally overrepresented in the
    matching set (fg% == 1 for an OR match on themselves)."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.facets import significant_terms

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array([t for t, _ in TEXTS], pa.string()),
    }))
    out = significant_terms(facet_index, "alpha", corpus, top_n=5, min_fg=1)
    assert not out.empty
    assert out["term"].iloc[0] == "alpha"
    # every fg_df ≤ bg_df and ≤ |matching set|
    assert (out["fg_df"] <= out["bg_df"]).all()


def test_significant_terms_zero_hit(facet_index):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.facets import significant_terms

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array([t for t, _ in TEXTS], pa.string()),
    }))
    out = significant_terms(facet_index, "zzzznotaterm", corpus)
    assert out.empty


def test_percolate_matches_conjunctive(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.facets import percolate

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["alpha beta gamma", "alpha", "beta alpha extra", ""],
    }))
    res = percolate(docs, [("q1", "alpha beta"), ("q2", "alpha"), ("q3", "zzz")]).to_pandas()
    got = set(map(tuple, res[["doc_id", "query_id"]].itertuples(index=False)))
    assert got == {(0, "q1"), (2, "q1"), (0, "q2"), (1, "q2"), (2, "q2")}


def test_sampler_terms_counts_only_sample(ray_session, tmp_path):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
    from hybrid_sanctions_search_engine_ray.stages.facets import sampler_terms

    texts = ["alpha beta", "alpha beta", "alpha gamma", "delta zzz", "delta zzz epsilon"]
    rows = [{"conv_id": f"c{i}", "turn_idx": 0, "role": "user", "text": t,
             "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
            for i, t in enumerate(texts)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    idx = str(tmp_path / "idx")
    build_index("mem", idx, EngineConfig(num_partitions=2), transcripts_ds=ds)
    corpus = rd.from_pandas(pd.DataFrame({"doc_id": range(5), "text": texts}))
    # sample_size 3 over query "alpha": only docs 0,1,2 sampled -> no delta/zzz
    out = sampler_terms(idx, "alpha", corpus,
                        analyzer_cfg=AnalyzerConfig(), sample_size=3, top_n=10)
    got = dict(zip(out["term"], out["doc_count"]))
    assert got == {"alpha": 3, "beta": 2, "gamma": 1}
    # zero-hit query -> empty frame with schema
    empty = sampler_terms(idx, "qqqmissing", corpus, analyzer_cfg=AnalyzerConfig())
    assert len(empty) == 0 and list(empty.columns) == ["term", "doc_count", "rank"]


def test_significant_terms_sampled_foreground(ray_session, tmp_path):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
    from hybrid_sanctions_search_engine_ray.stages.facets import significant_terms

    # docs 0-3 match "alpha"; doc 0-1 carry the marker term "special"
    texts = ["alpha special", "alpha special", "alpha plain", "alpha plain plain",
             "other words", "other stuff"]
    rows = [{"conv_id": f"c{i}", "turn_idx": 0, "role": "user", "text": t,
             "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
            for i, t in enumerate(texts)]
    idx = str(tmp_path / "idx")
    build_index("mem", idx, EngineConfig(num_partitions=2),
                transcripts_ds=rd.from_pandas(pd.DataFrame(rows)))
    corpus = rd.from_pandas(pd.DataFrame({"doc_id": range(6), "text": texts}))
    # sample_size=2: fg = the 2 best "alpha" hits = the shortest alpha docs
    # (highest BM25 for equal tf) -> docs 0,1 -> "special" has fg_df 2
    out = significant_terms(idx, "alpha", corpus, analyzer_cfg=AnalyzerConfig(),
                            top_n=5, min_fg=2, sample_size=2)
    got = out.set_index("term")
    assert got.loc["special", "fg_df"] == 2 and got.loc["special", "bg_df"] == 2
    # full-candidate mode still sees all 4 alpha docs
    full = significant_terms(idx, "alpha", corpus, analyzer_cfg=AnalyzerConfig(),
                             top_n=5, min_fg=2)
    assert full.set_index("term").loc["alpha", "fg_df"] == 4


def test_frequent_pairs_apriori_and_order(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
    from hybrid_sanctions_search_engine_ray.stages.facets import frequent_pairs

    texts = ["a b c", "a b", "a b d", "c d", "a c", "rare1 rare2"]
    corpus = rd.from_pandas(pd.DataFrame({"doc_id": range(6), "text": texts}))
    vocab = pd.DataFrame({"term": ["a", "b", "c", "d", "rare1", "rare2"],
                          "df": [4, 3, 3, 2, 1, 1]})
    out = frequent_pairs(corpus, AnalyzerConfig(), top_items=4, min_support=2,
                         top_n=10, vocab_df=vocab)
    got = {(r.term_a, r.term_b): r.support for r in out.itertuples()}
    # (a,b)=3, (a,c)=2; (a,d)/(b,c)/(b,d)/(c,d)=1 below floor;
    # rare1/rare2 pruned by top_items=4 despite co-occurring
    assert got == {("a", "b"): 3, ("a", "c"): 2}
    assert out["rank"].tolist() == [1, 2]
    # support floor above everything -> typed empty frame
    none = frequent_pairs(corpus, AnalyzerConfig(), top_items=4, min_support=99,
                          vocab_df=vocab)
    assert len(none) == 0 and list(none.columns) == ["term_a", "term_b", "support", "rank"]


def test_sig_terms_chi_square_hand_math(facet_index):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.facets import (
        matching_doc_ids, significant_terms)

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array([t for t, _ in TEXTS], pa.string()),
    }))
    jlh = significant_terms(facet_index, "alpha", corpus, top_n=50, min_fg=1)
    chi = significant_terms(facet_index, "alpha", corpus, top_n=50, min_fg=1,
                            heuristic="chi_square")
    assert "chi2" in chi.columns and (chi["chi2"] > 0).all()
    # chi_square keeps only overrepresented terms; counts agree with jlh
    m = jlh.merge(chi, on="term", suffixes=("_j", "_c"))
    assert (m["fg_df_j"] == m["fg_df_c"]).all() and (m["bg_df_j"] == m["bg_df_c"]).all()
    # hand-check one row against the explicit 2x2 formula
    r = IndexReader(facet_index)
    F = int(matching_doc_ids(r, "alpha").size)
    N = int(r.manifest.n_docs)
    row = chi.iloc[0]
    a = int(row["fg_df"]); b = int(row["bg_df"]) - a
    c = F - a; d = N - F - b
    want = N * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert abs(row["chi2"] - round(want, 4)) < 1e-9
    with pytest.raises(ValueError, match="heuristic"):
        significant_terms(facet_index, "alpha", corpus, heuristic="gnd")
