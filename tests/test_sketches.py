import numpy as np
import pytest

from hybrid_sanctions_search_engine_ray.functions.sketches import HyperLogLog, SpaceSaving


def zipf_stream(n, vocab=2000, seed=0):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = ranks**-1.2
    p /= p.sum()
    return rng.choice(np.array([f"w{i:05d}" for i in range(vocab)], dtype=object), size=n, p=p)


def test_spacesaving_exact_head():
    stream = zipf_stream(50_000)
    ss = SpaceSaving(capacity=512).add_many(stream)
    from collections import Counter

    exact = Counter(stream.tolist())
    top_exact = [w for w, _ in exact.most_common(10)]
    top_sketch = [item for item, _, _ in ss.topk(10)]
    assert top_sketch == top_exact
    # head estimates exact (error 0) for items that never got evicted
    for item, est, err in ss.topk(5):
        assert est - err <= exact[item] <= est


def test_spacesaving_merge_distributed():
    stream = zipf_stream(60_000, seed=3)
    parts = np.array_split(stream, 6)
    sketches = [SpaceSaving(capacity=512).add_many(p) for p in parts]
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.merge(s)
    from collections import Counter

    exact = Counter(stream.tolist())
    top_exact = [w for w, _ in exact.most_common(5)]
    top_merged = [item for item, _, _ in merged.topk(5)]
    assert top_merged == top_exact


def test_hll_accuracy():
    for true_n in (100, 10_000, 200_000):
        hll = HyperLogLog(p=12)
        hll.add_strings([f"item-{i}" for i in range(true_n)])
        est = hll.estimate()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge():
    a = HyperLogLog(p=12).add_strings([f"a{i}" for i in range(5000)])
    b = HyperLogLog(p=12).add_strings([f"b{i}" for i in range(5000)])
    overlap = HyperLogLog(p=12).add_strings([f"a{i}" for i in range(5000)])
    ab = a.merge(b)
    assert abs(ab.estimate() - 10_000) / 10_000 < 0.05
    aa = a.merge(overlap)  # duplicate content merges to same cardinality
    assert abs(aa.estimate() - 5000) / 5000 < 0.05


def test_hll_deterministic():
    e1 = HyperLogLog().add_strings([f"x{i}" for i in range(1000)]).estimate()
    e2 = HyperLogLog().add_strings([f"x{i}" for i in range(1000)]).estimate()
    assert e1 == e2


def test_spacesaving_merge_error_bound():
    """Mergeable-SS invariant: for every tracked key after a merge of
    capacity-saturated partials, est - max_error <= true <= est, and
    max_error == 0 only when the estimate is exact."""
    import numpy as np
    from collections import Counter

    from hybrid_sanctions_search_engine_ray.functions.sketches import SpaceSaving

    rng = np.random.default_rng(5)
    stream = [f"t{int(v):03d}" for v in rng.zipf(1.3, size=4000) if v < 500]
    truth = Counter(stream)
    parts = [stream[i::3] for i in range(3)]
    sketches = [SpaceSaving(capacity=32).add_many(p) for p in parts]
    merged = sketches[0].merge(sketches[1]).merge(sketches[2])
    for item, est, err in merged.topk(20):
        t = truth[item]
        assert t <= est, f"{item}: true {t} > est {est} (merge undercounts)"
        assert est - err <= t, f"{item}: est-err {est-err} > true {t}"
        if err == 0:
            assert est == t


# --- QuantileSketch ----------------------------------------------------------


def test_quantile_sketch_rank_error_bound():
    import numpy as np

    from hybrid_sanctions_search_engine_ray.functions.sketches import QuantileSketch

    rng = np.random.default_rng(7)
    data = rng.lognormal(3.0, 1.0, 100_000)
    parts = np.array_split(data, 23)
    m = QuantileSketch(256)
    for p in parts:
        m = m.merge(QuantileSketch(256).add_many(p))
    assert m.n == data.size  # compaction + merge are weight-exact
    s = np.sort(data)
    for q in [0.01, 0.25, 0.5, 0.9, 0.99]:
        est = m.quantile(q)
        rank_err = abs(np.searchsorted(s, est, side="right") - q * data.size) / data.size
        assert rank_err < 0.02, (q, rank_err)  # measured ~0.006 at k=256


def test_quantile_sketch_deterministic_and_small_inputs():
    import numpy as np

    from hybrid_sanctions_search_engine_ray.functions.sketches import QuantileSketch

    data = np.arange(1000, dtype=np.float64)
    a = QuantileSketch(64).add_many(data)
    b = QuantileSketch(64).add_many(data)
    for q in [0.1, 0.5, 0.9]:
        assert a.quantile(q) == b.quantile(q)  # deterministic compaction
    # small input (below k): exact quantile_disc values
    small = QuantileSketch(256).add_many(np.array([1.0, 2.0, 3.0, 4.0]))
    assert small.quantile(0.5) == 2.0
    assert small.quantile(1.0) == 4.0
    # empty
    import math
    assert math.isnan(QuantileSketch().quantile(0.5))
    # NaNs ignored
    sk = QuantileSketch().add_many(np.array([np.nan, 5.0, np.nan]))
    assert sk.n == 1 and sk.quantile(0.5) == 5.0


def test_quantile_sketch_merge_returns_new():
    import numpy as np

    from hybrid_sanctions_search_engine_ray.functions.sketches import QuantileSketch

    a = QuantileSketch(64).add_many(np.arange(100.0))
    b = QuantileSketch(64).add_many(np.arange(100.0, 200.0))
    n_a = a.n
    m = a.merge(b)
    assert a.n == n_a and m.n == 200  # left operand untouched
    # reusing `a` after the merge must not double-count
    m2 = a.merge(b)
    assert m2.n == 200


def test_quantile_sketch_rational_rank_rule():
    import numpy as np

    from hybrid_sanctions_search_engine_ray.functions.sketches import QuantileSketch

    # 0.28 * 25 = 7.000000000000001 in float: ceil must still say rank 7
    sk = QuantileSketch(256).add_many(np.arange(1.0, 26.0))
    assert sk.quantile(0.28) == 7.0  # DuckDB quantile_disc(x, 0.28) over 1..25
