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


def test_approx_quantiles_sketch_pipeline(ray_session):
    """The distributed path: pickle partials → tree merge → quantiles.
    Rank error of each returned value checked against the true data."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.sketch_ops import approx_quantiles_sketch

    rng = np.random.default_rng(5)
    vals = rng.lognormal(2.0, 1.0, 50_000)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(9)
    out = approx_quantiles_sketch(ds, "x", qs=[0.25, 0.5, 0.9], k=256)
    assert out["q"].tolist() == [0.25, 0.5, 0.9]
    s = np.sort(vals)
    for q, v in zip(out["q"], out["value"]):
        rank_err = abs(np.searchsorted(s, v, side="right") - q * vals.size) / vals.size
        assert rank_err < 0.02, (q, rank_err)


def test_approx_quantiles_sketch_empty(ray_session):
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.sketch_ops import approx_quantiles_sketch

    ds = rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype=float)}))
    out = approx_quantiles_sketch(ds, "x", qs=[0.5])
    assert len(out) == 0
