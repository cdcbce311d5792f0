import numpy as np
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.functions.fusion import rrf_fusion, weighted_fusion
from hybrid_sanctions_search_engine_ray.stages.validate import clean, validate_batch


def test_weighted_fusion_shared_bonus():
    da, sa = np.array([1, 2, 3]), np.array([3.0, 2.0, 1.0])
    db, sb = np.array([3, 4]), np.array([5.0, 2.5])
    docs, scores = weighted_fusion(da, sa, db, sb, w_a=0.65, w_b=0.35, shared_bonus=0.15, top_k=10)
    got = dict(zip(docs.tolist(), scores.tolist()))
    # doc 3: 0.65*(1/3) + 0.35*1.0 + 0.15 shared
    assert abs(got[3] - (0.65 / 3 + 0.35 + 0.15)) < 1e-12
    # doc 1: only list a, max there → 0.65
    assert abs(got[1] - 0.65) < 1e-12
    assert docs[0] == 1 or docs[0] == 3  # highest fused first
    assert scores[0] >= scores[-1]


def test_weighted_fusion_empty_side():
    da, sa = np.array([1]), np.array([2.0])
    docs, scores = weighted_fusion(da, sa, np.array([], dtype=np.int64), np.array([]), top_k=5)
    assert docs.tolist() == [1]


def test_rrf():
    docs, scores = rrf_fusion([np.array([1, 2, 3]), np.array([3, 1, 4])], k=60, top_k=10)
    got = dict(zip(docs.tolist(), scores.tolist()))
    assert abs(got[1] - (1 / 61 + 1 / 62)) < 1e-12
    assert docs[0] == 1  # appears near top of both lists


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts, pa.string())})


def test_validate_batch():
    b = validate_batch(_t(["ok", "", "   ", "x" * 20]), max_len=10)
    assert b["valid"].to_pylist() == [True, False, False, True]
    assert b["truncated"].to_pylist() == [False, False, False, True]
    assert b["reject_reason"].to_pylist() == ["", "empty", "empty", ""]


def test_clean_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_t(["good text", "", "\x00weird\x01", "y" * 50]))
    out = clean(ds, max_len=10).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 2, 3]
    assert out.loc[out.doc_id == 2, "text"].iloc[0] == "weird"
    assert len(out.loc[out.doc_id == 3, "text"].iloc[0]) == 10


# --- smart pre-filter (reference M2) -----------------------------------------


def test_smart_prefilter_signals():
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.validate import smart_prefilter

    b = pa.table({"text": pa.array([
        "John Smith sent payment",      # name + context
        "Иван Петров перевод",          # cyrillic name (context word not in list)
        "12.03.2024 10:30",             # date-only → excluded
        "just lowercase words here",     # no signals
        "Acme LLC invoice",             # company + context
        "",                              # empty → excluded
        None,                            # null → excluded
        "Payment Order 123",            # capitalized pair + context
    ])})
    out = smart_prefilter(b).to_pandas()
    assert out["name_signal"].tolist() == [True, True, False, False, False, False, False, True]
    assert out["company_signal"].tolist()[4] is True or bool(out["company_signal"][4])
    assert out["should_process"].tolist() == [True, True, False, False, True, False, False, True]
    assert out["confidence"][0] == 0.7 and out["confidence"][4] == 0.6
    assert out["confidence"][2] == 0.0


def test_smart_prefilter_date_only_excluded_even_with_signals():
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.validate import smart_prefilter

    # a date-only string can never carry signals (regexes need letters),
    # but the exclusion must dominate regardless
    out = smart_prefilter(pa.table({"text": pa.array(["  2024/01/01 ", "3-4, 5:6"])})).to_pandas()
    assert not out["should_process"].any()


def test_smart_prefilter_cyrillic_markers():
    """RE2's \\b is ASCII-only — the explicit boundary classes must make
    Cyrillic company/context markers actually fire."""
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.validate import smart_prefilter

    out = smart_prefilter(pa.table({"text": pa.array([
        "платеж от ооо ромашка",   # context + company, lowercase cyrillic
        "оплата услуг",            # context only
        "просто текст без маркеров",
        "тов альфа",               # company only
    ])})).to_pandas()
    assert out["company_signal"].tolist() == [True, False, False, True]
    assert out["context_signal"].tolist() == [True, True, False, False]
    assert out["should_process"].tolist() == [True, True, False, True]
    # markers embedded INSIDE a longer word must not fire
    out2 = smart_prefilter(pa.table({"text": pa.array(["оплатах", "balance"])})).to_pandas()
    assert not out2["context_signal"].any()
    assert not out2["company_signal"].any()


def test_k_anonymity_audit(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.validate import k_anonymity_audit

    # classes: (a,x)=6 rows, (a,y)=3, (b,x)=1
    df = pd.DataFrame({"lang": ["a"] * 9 + ["b"],
                       "source": ["x"] * 6 + ["y"] * 3 + ["x"]})
    out = k_anonymity_audit(rd.from_pandas(df).repartition(3),
                            ["lang", "source"], [2, 4, 10]).set_index("k")
    assert int(out.loc[2, "n_classes_at_risk"]) == 1          # the singleton
    assert int(out.loc[2, "n_rows_at_risk"]) == 1
    assert int(out.loc[4, "n_classes_at_risk"]) == 2          # +(a,y)
    assert int(out.loc[4, "n_rows_at_risk"]) == 4
    assert int(out.loc[10, "n_classes_at_risk"]) == 3         # everything
    assert out.loc[10, "risk_frac"] == 1.0
    assert (out["n_classes"] == 3).all()


def test_l_diversity_audit(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.validate import l_diversity_audit

    # class x: langs {a,b,c}; class y: lang {a} only (homogeneous, 4 rows)
    df = pd.DataFrame({"source": ["x"] * 6 + ["y"] * 4,
                       "lang": ["a", "a", "b", "b", "c", "c"] + ["a"] * 4})
    out = l_diversity_audit(rd.from_pandas(df).repartition(3),
                            ["source"], "lang", [2, 4]).set_index("l")
    assert int(out.loc[2, "n_classes_at_risk"]) == 1
    assert int(out.loc[2, "n_rows_at_risk"]) == 4
    assert int(out.loc[4, "n_classes_at_risk"]) == 2   # x has only 3 distinct
    assert out.loc[4, "risk_frac"] == 1.0


def test_benford_and_gini(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.es_aggs import benford_audit
    from hybrid_sanctions_search_engine_ray.stages.textops import vocab_gini
    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig

    # exact digit counts: values 1.00..9.00 once each → every digit n=1
    ev = rd.from_pandas(pd.DataFrame({"value": [float(d) for d in range(1, 10)]
                                      + [0.0, -3.0]}))  # nonpositive excluded
    out = benford_audit(ev)
    assert (out["n"] == 1).all() and len(out) == 9
    assert abs(out["benford_p"].sum() - 1.0) < 1e-3

    # gini: uniform counts → 0; maximally skewed → near 1
    uni = vocab_gini(rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b c d"] * 4})), AnalyzerConfig(mode="simple"))
    assert uni["gini"].iloc[0] == 0.0
    skew = vocab_gini(rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(1, dtype=np.int64),
        "text": ["rare " + "common " * 99]})), AnalyzerConfig(mode="simple"))
    assert skew["gini"].iloc[0] > 0.45
