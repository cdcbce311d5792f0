"""Property-based parity tests (hypothesis): the vectorized Arrow index
paths must tokenize EXACTLY like the Python query-side tokenizers on
arbitrary text — the index/query identity every ranked result relies
on — and the distributed operators must match their local references."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from hybrid_sanctions_search_engine_ray.functions.analyzer import (
    tokenize_char3,
    tokenize_shingle,
    tokenize_simple,
)
from hybrid_sanctions_search_engine_ray.stages.analyze import (
    _char3_flat,
    _shingle_flat,
    flat_terms,
)
from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig

# Deliberately hostile alphabet: ASCII, Cyrillic, digits, punctuation,
# COMBINING ACUTE (u0301, NFD composition case), zero-width-ish space,
# the Turkish dotted capital İ (Python-lower special case), sharp-s.
_ALPHA = "abc XYZ 012 .,-!«»́éİßёабвгд  \t\n'"


@settings(max_examples=250, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, max_size=60), min_size=1, max_size=8))
def test_simple_arrow_matches_python(texts):
    batch = pa.table({"text": pa.array(texts, pa.string())})
    parent, terms = flat_terms(batch, AnalyzerConfig(mode="simple"))
    got: dict[int, list] = {}
    for p, t in zip(parent.tolist(), terms.to_pylist()):
        got.setdefault(p, []).append(t)
    for i, s in enumerate(texts):
        assert got.get(i, []) == tokenize_simple(s), repr(s)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_ALPHA, max_size=60))
def test_char3_arrow_matches_python(text):
    parent, grams = _char3_flat(pa.array([text], pa.string()))
    assert sorted(set(grams.to_pylist())) == tokenize_char3(text)
    assert len(grams) == len(set(grams.to_pylist()))  # distinct per doc


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_ALPHA, max_size=60))
def test_shingle_arrow_matches_python(text):
    parent, terms = _shingle_flat(pa.array([text], pa.string()))
    assert sorted(terms.to_pylist()) == sorted(tokenize_shingle(text))


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_asof_join_matches_pandas_merge_asof(ray_session, data):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.joins import asof_join

    n_l = data.draw(st.integers(1, 30))
    n_r = data.draw(st.integers(0, 30))
    keys = st.integers(0, 3)
    # unique (key, ts) pairs on the right — the documented determinism precondition
    lf = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": [data.draw(keys) for _ in range(n_l)],
        "t": [data.draw(st.integers(0, 1000)) for _ in range(n_l)],
    })
    rt = data.draw(st.lists(st.tuples(keys, st.integers(0, 1000)),
                            min_size=n_r, max_size=n_r, unique=True))
    rf = pd.DataFrame({"rid": np.arange(len(rt), dtype=np.int64) + 100,
                       "k": np.array([k for k, _ in rt], dtype=np.int64),
                       "t": np.array([t for _, t in rt], dtype=np.int64),
                       "v": np.arange(len(rt), dtype=np.float64)})
    got = asof_join(rd.from_pandas(lf), rd.from_pandas(rf),
                    key="k", ts="t", how="left").to_pandas().sort_values("lid")
    ref = pd.merge_asof(lf.sort_values("t", kind="mergesort"),
                        rf.sort_values("t", kind="mergesort"),
                        on="t", by="k", direction="backward",
                        suffixes=("", "_r")).sort_values("lid")
    got_r = got["rid"].astype("float64").fillna(-1).tolist()
    ref_r = ref["rid"].astype("float64").fillna(-1).tolist()
    assert got_r == ref_r


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False),
                min_size=1, max_size=400),
       st.integers(2, 6))
def test_quantiles_match_numpy_selection(ray_session, vals, nparts):
    from fractions import Fraction

    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.quantiles import (
        _disc_index,
        grouped_exact_quantiles,
    )

    vals = [round(v, 1) for v in vals]  # quantized — the operator's domain
    df = pd.DataFrame({"k": ["g"] * len(vals), "v": vals})
    qs = [0.25, 0.5, 0.9]
    got = grouped_exact_quantiles(rd.from_pandas(df).repartition(nparts),
                                  key="k", col="v", qs=qs).to_pandas()
    s = np.sort(np.asarray(vals))
    for q in qs:
        want = s[_disc_index(Fraction(str(q)), len(vals))]
        assert float(got.loc[got["q"] == q, "value"].iloc[0]) == float(want)


# --- session-8 kernels: Damerau, ratio family, grid cells ---------------------

from hybrid_sanctions_search_engine_ray.functions.fuzzy import (  # noqa: E402
    damerau_levenshtein,
    levenshtein,
    ratio100,
    token_set_ratio,
    token_sort_ratio,
)

_W = st.text(alphabet="abcde", max_size=7)


def _dl_brute(a: str, b: str) -> int:
    """Reference unrestricted Damerau-Levenshtein (textbook DP with the
    last-seen-character table), independent of the production kernel."""
    da = {}
    maxd = len(a) + len(b)
    d = [[maxd] * (len(b) + 2) for _ in range(len(a) + 2)]
    for i in range(len(a) + 1):
        d[i + 1][1] = i
    for j in range(len(b) + 1):
        d[1][j + 1] = j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            k, l = da.get(b[j - 1], 0), db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost, d[i + 1][j] + 1, d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1))
        da[a[i - 1]] = i
    return d[len(a) + 1][len(b) + 1]


@settings(max_examples=300, deadline=None)
@given(_W, _W)
def test_damerau_matches_textbook_dp(a, b):
    got = damerau_levenshtein(a, b)
    assert got == _dl_brute(a, b)
    assert got == damerau_levenshtein(b, a)            # symmetry
    assert got <= levenshtein(a, b)                    # transpositions only help
    assert got >= abs(len(a) - len(b))                 # length lower bound


@settings(max_examples=300, deadline=None)
@given(_W, _W, st.integers(min_value=0, max_value=4))
def test_damerau_banded_matches_unbanded(a, b, md):
    """The Ukkonen-banded Damerau kernel (the expansion hot path) is
    exact: min(d, md+1) for every (pair, cap)."""
    full = damerau_levenshtein(a, b)
    assert damerau_levenshtein(a, b, max_dist=md) == min(full, md + 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=4),
                min_size=1, max_size=5),
       st.lists(st.text(alphabet="abcd", min_size=1, max_size=4),
                min_size=1, max_size=5))
def test_ratio_family_properties(wa, wb):
    a, b = " ".join(wa), " ".join(wb)
    for fn in (ratio100, token_sort_ratio, token_set_ratio):
        v = fn(a, b)
        assert 0.0 <= v <= 100.0
        assert fn(a, b) == fn(b, a)                    # symmetry
        assert fn(a, a) == 100.0                       # identity
    # token_sort is word-order invariant
    assert token_sort_ratio(a, " ".join(reversed(wb))) == token_sort_ratio(a, b)
    # token_set forgives pure-subset differences entirely
    assert token_set_ratio(a, a + " " + a.split()[0]) == 100.0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=50))
def test_geo_grid_cells_in_range(keys):
    from hybrid_sanctions_search_engine_ray.stages.geo import derive_coords

    lat, lon = derive_coords(np.asarray(keys, dtype=np.int64))
    cy = np.floor((lat + 90.0) / 22.5)
    cx = np.floor((lon + 180.0) / 22.5)
    assert ((cy >= 0) & (cy < 8)).all() and ((cx >= 0) & (cx < 16)).all()
