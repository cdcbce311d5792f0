"""char3 analyzer mode, fuzzy term expansion, and result post-filters."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.functions.analyzer import char3_grams, tokenize_char3
from hybrid_sanctions_search_engine_ray.functions.fuzzy import (
    FuzzyExpander,
    levenshtein,
    similarity_ratio,
)
from hybrid_sanctions_search_engine_ray.stages.analyze import _char3_flat
from hybrid_sanctions_search_engine_ray.stages.postfilter import rank_filter_boost

# --- char3 analyzer ---------------------------------------------------------


def test_char3_grams_basic():
    assert char3_grams("spark") == ["spa", "par", "ark"]
    assert char3_grams("ab") == ["ab"]
    assert char3_grams("abc") == ["abc"]


def test_tokenize_char3_distinct_sorted():
    out = tokenize_char3("Spark spark ark!")
    assert out == sorted(set(out))
    assert "spa" in out and "ark" in out


@pytest.mark.parametrize(
    "text",
    ["Spark join filter!", "ab", "café naïve", "ёжик пётр xx1", "a b c dddd", ""],
)
def test_char3_arrow_matches_python(text):
    """The vectorized Arrow path and the Python tokenizer must produce
    the same per-doc distinct gram sets."""
    parent, grams = _char3_flat(pa.array([text]))
    got = set(grams.to_pylist())
    assert got == set(tokenize_char3(text))
    assert len(got) == len(grams)  # distinct (doc, gram) pairs


def test_char3_index_typo_recall(ray_session, tmp_path):
    """A trigram index retrieves the right doc for a typo'd query — the
    recall property the reference's char_ngram_analyzer subfield exists
    for (elasticsearch_component_template.json:40-49)."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
    from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader

    texts = [
        "spark streaming join pipeline",
        "customer order table",
        "unrelated words entirely",
    ]
    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
        for i, t in enumerate(texts)
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    idx = str(tmp_path / "char3idx")
    cfg = EngineConfig(num_partitions=4, analyzer=AnalyzerConfig(mode="char3"))
    m = build_index("mem", idx, cfg, transcripts_ds=ds)
    assert m.analyzer_mode == "char3"
    r = IndexReader(idx)
    docs, scores = r.search_one("sprak streeming", 3)  # two typos
    assert docs.size > 0 and int(docs[0]) == 0, "typo query must hit the spark doc first"


# --- fuzzy levenshtein ------------------------------------------------------


def test_levenshtein_known_cases():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("spark", "sprak") == 2      # transposition = 2 edits (no Damerau)
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("", "abc") == 3
    # byte semantics (DuckDB parity): 2-byte cyrillic chars differ in 2 bytes
    assert levenshtein("ёжик", "ежик") == 2


def test_levenshtein_banded_early_exit():
    assert levenshtein("aaaaaaaaaa", "bbbbbbbbbb", max_dist=2) == 3  # capped at max+1
    assert levenshtein("abcdef", "abcdxf", max_dist=2) == 1
    assert levenshtein("ab", "abcdefgh", max_dist=2) == 3  # length gap > band


def test_similarity_ratio():
    assert similarity_ratio("spark", "spark") == 1.0
    assert 0.0 < similarity_ratio("spark", "sprak") < 1.0
    assert similarity_ratio("", "") == 1.0


def test_fuzzy_expander_batch():
    batch = pa.table({"term": pa.array(["spark", "sharp", "join", "filter", "fliter"])})
    out = FuzzyExpander(["sprak"], max_dist=2)(batch)
    got = dict(zip(out["term"].to_pylist(), out["dist"].to_pylist()))
    assert got["spark"] == 2
    assert "join" not in got and "filter" not in got


# --- post-filter stage ------------------------------------------------------


def _results():
    return pd.DataFrame(
        {
            "query_id": ["q1"] * 4 + ["q2"] * 2,
            "rank": np.array([1, 2, 3, 4, 1, 2], dtype=np.int32),
            "doc_id": np.array([10, 11, 12, 13, 20, 21], dtype=np.int64),
            "score": [0.9, 0.5, 0.5, 0.01, 0.3, 0.2],
        }
    )


def _meta():
    return pd.DataFrame(
        {
            "doc_id": np.array([10, 11, 12, 13, 20, 21], dtype=np.int64),
            "role": ["tool", "user", "assistant", "user", "user", "assistant"],
        }
    )


def test_post_filter_threshold_and_roles():
    out = rank_filter_boost(
        _results(), meta=_meta(), min_score=0.05,
        allowed_values={"user", "assistant"}, boosts={"user": 1.2}, top_k=10,
    )
    # doc 10 dropped (role tool), doc 13 dropped (score < min)
    assert set(out["doc_id"]) == {11, 12, 20, 21}


def test_post_filter_boost_reorders():
    out = rank_filter_boost(
        _results(), meta=_meta(), min_score=0.0,
        allowed_values={"user", "assistant"}, boosts={"user": 1.2}, top_k=10,
    )
    q1 = out[out.query_id == "q1"].sort_values("rank")
    # 11 (user, 0.5*1.2=0.6) outranks 12 (assistant, 0.5)
    assert q1.iloc[0]["doc_id"] == 11 and q1.iloc[1]["doc_id"] == 12
    assert q1.iloc[0]["boosted_score"] == 0.6
    assert list(q1["rank"]) == [1, 2, 3]


def test_post_filter_rank_ties_doc_id_asc():
    res = pd.DataFrame(
        {
            "query_id": ["q"] * 3,
            "rank": np.array([1, 2, 3], dtype=np.int32),
            "doc_id": np.array([5, 3, 4], dtype=np.int64),
            "score": [0.5, 0.5, 0.5],
        }
    )
    out = rank_filter_boost(res, top_k=2)
    assert list(out["doc_id"]) == [3, 4]  # ties → doc_id asc, truncated


def test_did_you_mean_prefers_distance_then_df(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.functions.fuzzy import did_you_mean

    vocab = rd.from_items(
        [
            {"term": "vector", "df": 100},
            {"term": "vektor22", "df": 500},  # dist 2, higher df
            {"term": "vextors", "df": 900},   # dist 2, highest df
            {"term": "zzz", "df": 9999},
        ]
    )
    got = did_you_mean(vocab, ["vektor", "qqqq"], max_dist=2).to_pandas()
    # vektor→vector wins on DISTANCE (1) despite lower df; qqqq → no row
    assert got["q_term"].tolist() == ["vektor"]
    assert got["suggestion"].iloc[0] == "vector"
    assert int(got["dist"].iloc[0]) == 1


def test_did_you_mean_df_breaks_distance_ties(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.functions.fuzzy import did_you_mean

    vocab = rd.from_items(
        [{"term": "cat", "df": 5}, {"term": "car", "df": 50}, {"term": "can", "df": 50}]
    )
    got = did_you_mean(vocab, ["caq"], max_dist=1).to_pandas()
    # dist all 1 → df desc → tie between car/can at df 50 → term asc = "can"
    assert got["suggestion"].iloc[0] == "can"


def test_completion_suggest_fuzzy_prefix(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.functions.fuzzy import completion_suggest

    vocab = rd.from_arrow(pa.table({
        "term": pa.array(["spark", "sparse", "spam", "window", "windows", "zebra"]),
        "df": pa.array([50, 10, 10, 40, 5, 1], pa.int64()),
    }))
    out = completion_suggest(vocab, {"a": "spa", "b": "wimdo"}, size=3,
                             fuzziness=1).to_pandas()
    a = out[out["query_id"] == "a"]
    # exact-prefix matches (dist 0) rank before fuzzy, then weight desc
    assert a["term"].tolist() == ["spark", "spam", "sparse"]
    assert a["dist"].tolist() == [0, 0, 0]
    b = out[out["query_id"] == "b"]
    # "wimdo" vs "windo"/"windo" — one substitution
    assert b["term"].tolist() == ["window", "windows"]
    assert set(b["dist"]) == {1}


def test_fuzzy_expand_prefix_length(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.functions.fuzzy import fuzzy_expand

    vocab = rd.from_arrow(pa.table({
        "term": pa.array(["join", "jion", "lion", "coin", "joins"]),
        "df": pa.array([10, 1, 5, 5, 3], pa.int64()),
    }))
    free = fuzzy_expand(vocab, ["jion"], max_dist=2, topn=10).to_pandas()
    # plain Levenshtein (no transposition): join=2 (i<->o as two subs),
    # lion=2, jion=0; coin/joins are 3 ops away
    assert set(free["term"]) == {"join", "jion", "lion"}
    pl2 = fuzzy_expand(vocab, ["jion"], max_dist=2, topn=10, prefix_len=2).to_pandas()
    # only terms sharing the exact 'ji' onset survive
    assert set(pl2["term"]) == {"jion"}


# --- Damerau-Levenshtein (true / unrestricted) -------------------------------


def test_damerau_classic_vectors():
    from hybrid_sanctions_search_engine_ray.functions.fuzzy import (
        damerau_levenshtein,
        levenshtein,
    )

    # adjacent swap costs 1 (vs 2 plain)
    assert damerau_levenshtein("ab", "ba") == 1 and levenshtein("ab", "ba") == 2
    assert damerau_levenshtein("tabel", "table") == 1
    assert damerau_levenshtein("sprak", "spark") == 1
    # TRUE DL, not OSA: edits may touch the transposed pair
    assert damerau_levenshtein("CA", "ABC") == 2
    assert damerau_levenshtein("", "abc") == 3
    assert damerau_levenshtein("abc", "abc") == 0


def test_damerau_duckdb_parity_random():
    """The oracle contract: the Python kernel IS DuckDB's
    damerau_levenshtein (true DL over UTF-8 bytes)."""
    import random

    import duckdb

    from hybrid_sanctions_search_engine_ray.functions.fuzzy import damerau_levenshtein

    con = duckdb.connect()
    rng = random.Random(3)
    for _ in range(300):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 6)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 6)))
        want = con.execute("select damerau_levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)
    # multi-byte: over UTF-8 bytes, exactly like DuckDB
    assert damerau_levenshtein("café", "cafe") == con.execute(
        "select damerau_levenshtein('café', 'cafe')").fetchone()[0]


def test_fuzzy_expand_damerau_metric(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.functions.fuzzy import fuzzy_expand

    vocab = rd.from_arrow(pa.table({
        "term": pa.array(["join", "jion", "lion", "coin"]),
        "df": pa.array([10, 1, 5, 5], pa.int64()),
    }))
    dl = fuzzy_expand(vocab, ["jion"], max_dist=1, topn=10,
                      metric="damerau").to_pandas()
    # transposition brings 'join' inside distance 1; plain metric can't
    assert set(dl["term"]) == {"jion", "join", "lion"}
    lev = fuzzy_expand(vocab, ["jion"], max_dist=1, topn=10).to_pandas()
    assert set(lev["term"]) == {"jion", "lion"}


def test_ratio_family_hand_math():
    from hybrid_sanctions_search_engine_ray.functions.fuzzy import (
        partial_ratio, ratio100, token_set_ratio, token_sort_ratio, weighted_ratio)

    assert ratio100("abc", "abc") == 100.0
    assert ratio100("abc", "abd") == 100.0 * (1 - 1 / 3)
    # word transposition: plain ratio low, token_sort exact
    assert token_sort_ratio("hash join", "join hash") == 100.0
    assert ratio100("hash join", "join hash") < 100.0
    # subset vs superset: token_set forgives the extra token
    assert token_set_ratio("hash join", "hash join fast") == 100.0
    # word-boundary partial: substring window scores 100
    assert partial_ratio("hash join", "the hash join runs") == 100.0
    assert partial_ratio("", "") == 100.0
    # weighted combination respects the documented left-to-right order
    w = weighted_ratio("hash join", "join hash")
    assert abs(w - (0.4 * ratio100("hash join", "join hash")
                    + 0.35 * 100.0 + 0.25 * 100.0)) < 1e-12


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=16), st.text(max_size=16))
def test_jaro_winkler_duckdb_parity(a, b):
    """jaro_winkler / jaro_similarity must be bit-parity with DuckDB's
    functions over arbitrary unicode (the jaro_expand oracle contract)."""
    import duckdb

    from hybrid_sanctions_search_engine_ray.functions.fuzzy import (
        jaro_similarity,
        jaro_winkler,
    )

    con = duckdb.connect()
    jw, js = con.execute(
        "SELECT jaro_winkler_similarity(?, ?), jaro_similarity(?, ?)",
        [a, b, a, b]).fetchone()
    assert abs(jaro_winkler(a, b) - jw) < 1e-12
    assert abs(jaro_similarity(a, b) - js) < 1e-12
