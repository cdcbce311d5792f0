"""PII redaction (stages/redact.py) and repetition quality signals
(stages/textops.py::repetition_stats)."""

import numpy as np
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.redact import redact_pii
from hybrid_sanctions_search_engine_ray.stages.textops import repetition_stats


def _tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})


def test_redact_masks_each_type():
    out = redact_pii(
        _tbl(
            [
                "mail me at bob.smith+x@corp.example.org now",
                "server 192.168.001.250 down",
                "call +1-800-555-0199 today",
                "card 4111111111111111 leaked",
                "clean text with no pii",
                None,
            ]
        )
    )
    clean = out["clean"].to_pylist()
    n = out["n_pii"].to_pylist()
    assert clean[0] == "mail me at <EMAIL> now" and n[0] == 1
    assert clean[1] == "server <IP> down" and n[1] == 1
    assert clean[2] == "call <PHONE> today" and n[2] == 1
    assert clean[3] == "card <ID> leaked" and n[3] == 1
    assert clean[4] == "clean text with no pii" and n[4] == 0
    assert clean[5] == "" and n[5] == 0


def test_redact_order_email_shields_digits():
    # the email's digits must NOT additionally fire the idnum rule
    out = redact_pii(_tbl(["x 1234567890123456a@example.com y"]))
    assert out["clean"].to_pylist() == ["x <EMAIL> y"]
    assert out["n_pii"].to_pylist() == [1]


def test_repetition_fractions():
    cfg = AnalyzerConfig()
    out = repetition_stats(
        _tbl(
            [
                "a b c d",            # all distinct: dup fracs 0
                "a a a a",            # 4 tokens 1 distinct; bigrams: 3 total 1 distinct
                "one",                # single token: no bigrams
                "",                   # empty
            ]
        ),
        cfg,
    )
    nt = out["n_tokens"].to_pylist()
    nd = out["n_distinct"].to_pylist()
    dt = out["dup_token_frac"].to_pylist()
    db = out["dup_bigram_frac"].to_pylist()
    assert nt == [4, 4, 1, 0] and nd == [4, 1, 1, 0]
    assert dt[0] == 0.0 and abs(dt[1] - 0.75) < 1e-12
    assert db[0] == 0.0 and abs(db[1] - (1 - 1 / 3)) < 1e-12
    assert db[2] == 0.0 and dt[3] == 0.0
