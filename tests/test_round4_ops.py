"""Closed-form unit tests for the round-4 operator batch — each op's
oracle gives value-level evidence at two scales; these pin the tricky
EDGE semantics (boundaries, ties, empty inputs) with hand-built data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_dictionary_match_overlap_and_absent(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.textops import dictionary_match

    ds = rd.from_items([
        {"doc_id": 0, "text": "aaaa"},          # 'aa' non-overlapping -> 2
        {"doc_id": 1, "text": "ab ab ab"},
        {"doc_id": 2, "text": "none here"},
    ])
    out = dictionary_match(ds, ["aa", "ab", "zz"]).to_pandas() \
        .set_index("pattern").sort_index()
    assert int(out.loc["aa", "n_occ"]) == 2 and int(out.loc["aa", "n_docs"]) == 1
    assert int(out.loc["ab", "n_occ"]) == 3 and int(out.loc["ab", "n_docs"]) == 1
    assert int(out.loc["zz", "n_occ"]) == 0 and int(out.loc["zz", "n_docs"]) == 0


def test_readability_known_sentence(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.textops import readability_scores

    # 7 words, 3 sentence runs, 8 vowel groups (counted by the regex)
    ds = rd.from_items([{"doc_id": 0,
                         "text": "Hello world. This is a test! Right?"}])
    r = readability_scores(ds).to_pandas().iloc[0]
    assert (int(r["n_words"]), int(r["n_sentences"]), int(r["n_syllables"])) == (7, 3, 8)
    fk = 0.39 * (7 / 3) + 11.8 * (8 / 7) - 15.59
    assert abs(float(r["fk_grade"]) - round(fk, 4)) < 1e-9


def test_kn_bigram_closed_form(ray_session):
    """Corpus with one dominant bigram: P_KN matches the hand formula."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.textrank import kn_bigrams

    # "alpha beta" x6 in one doc (adjacency counts 5 forward repeats? no:
    # tokens alternate, each 'alpha beta' adjacency occurs 6x; 'beta
    # alpha' 5x)
    text = " ".join(["alpha beta"] * 6)
    ds = rd.from_items([{"doc_id": 0, "conv_id": "c", "turn_idx": 0,
                         "role": "user", "text": text}])
    out = kn_bigrams(ds, min_count=1, top_n=10).set_index(["s", "t"])
    # edges: alpha->beta w=6, beta->alpha w=5
    # cl(alpha)=6, ot(alpha)=1; cl(beta)=5, ot(beta)=1; it(beta)=1,
    # it(alpha)=1; total types=2
    p_ab = max(6 - 0.75, 0) / 6 + 0.75 * 1 / 6 * (1 / 2)
    p_ba = max(5 - 0.75, 0) / 5 + 0.75 * 1 / 5 * (1 / 2)
    assert abs(float(out.loc[("alpha", "beta"), "pkn"]) - round(p_ab, 4)) < 1e-9
    assert abs(float(out.loc[("beta", "alpha"), "pkn"]) - round(p_ba, 4)) < 1e-9


def test_scd2_islands(ray_session):
    import ray.data as rd

    rows = [
        {"user_id": 1, "event_id": 1, "event_type": "a",
         "ts": pd.Timestamp("2024-01-01 00:00:00")},
        {"user_id": 1, "event_id": 2, "event_type": "a",
         "ts": pd.Timestamp("2024-01-01 00:01:00")},
        {"user_id": 1, "event_id": 3, "event_type": "b",
         "ts": pd.Timestamp("2024-01-01 00:02:00")},
        {"user_id": 1, "event_id": 4, "event_type": "a",
         "ts": pd.Timestamp("2024-01-01 00:03:00")},
    ]
    import __ray_entry__  # noqa: F401  (query fn reused directly)
    from __ray_entry__ import q_scd2_intervals  # type: ignore

    import os, tempfile
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows),
                                            preserve_index=False),
                       os.path.join(d, "events.parquet"))
        out = q_scd2_intervals(d).to_pandas().sort_values("valid_from_us") \
            .reset_index(drop=True)
    # a(2 events) -> b(1) -> a(1, open)
    assert out["status"].tolist() == ["a", "b", "a"]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["valid_to_us"].tolist()[:2] == out["valid_from_us"].tolist()[1:]
    assert int(out["valid_to_us"].iloc[2]) == -1


def test_quantile_normalize_tie_min_rank(ray_session):
    import os, tempfile

    import pyarrow.parquet as pq
    import __ray_entry__
    from __ray_entry__ import q_quantile_normalize  # type: ignore

    rows = [{"event_id": i, "value": v}
            for i, v in enumerate([1.0, 1.0, 2.0, 3.0])]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows),
                                            preserve_index=False),
                       os.path.join(d, "events.parquet"))
        out = q_quantile_normalize(d).to_pandas().sort_values("event_id")
    # ties -> min rank: both 1.0 rows have pct 0; 2.0 -> 2/4; 3.0 -> 3/4
    assert out["pct"].tolist() == [0.0, 0.0, 0.5, 0.75]
