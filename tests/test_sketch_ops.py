import pyarrow.dataset as pads

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.sketch_ops import distinct_terms_hll, top_terms_sketch

CFG = AnalyzerConfig(mode="simple")


def test_top_terms_sketch_matches_exact(corpus_dir, ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.functions.analyzer import tokenize_simple

    ds = rd.read_parquet(corpus_dir)
    out = top_terms_sketch(ds, CFG, capacity=4096, k=10)

    from collections import Counter

    exact = Counter()
    for t in pads.dataset(corpus_dir).to_table(columns=["text"])["text"].to_pylist():
        exact.update(tokenize_simple(t))
    top_exact = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert out["term"].tolist() == [t for t, _ in top_exact]
    assert out["est_count"].tolist() == [c for _, c in top_exact]
    assert (out["max_error"] == 0).all()  # skewed head → exact


def test_distinct_hll_close_to_exact(corpus_dir, ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.functions.analyzer import tokenize_simple

    ds = rd.read_parquet(corpus_dir)
    est = distinct_terms_hll(ds, CFG)
    exact = set()
    for t in pads.dataset(corpus_dir).to_table(columns=["text"])["text"].to_pylist():
        exact.update(tokenize_simple(t))
    assert abs(est - len(exact)) / len(exact) < 0.05
