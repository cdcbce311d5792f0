"""PII redaction — the standard pre-training scrub pass (emails, phone
numbers, IPs, long digit runs → typed placeholder tokens).

Reference analog: the sanctions service's input sanitizer strips control
characters and validates payloads (src/ai_service/utils/input_validation
— SURVEY.md §2.2 M1); a training-data engine needs the stronger form:
deterministic PII masking applied corpus-wide.

Every pattern is RE2 (no lookaround/backrefs) and shared VERBATIM with
the DuckDB oracle (`__ray_entry__.oracle_sql()["pii_redact"]`) — Arrow's
``replace_substring_regex`` and DuckDB's ``regexp_replace(..., 'g')``
both run RE2, so redacted output is byte-identical across engines.
Patterns apply in list order (earlier masks can shield later patterns,
e.g. the email mask removes its digits before the digit-run rule).
One vectorized sweep per pattern per batch; no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — ORDER MATTERS.
# \b is ASCII-only in RE2: fine here, every boundary neighbor is a digit
# or ASCII letter by construction.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\-]{7,16}\d", "<PHONE>"),
    ("idnum", r"\b\d{13,19}\b", "<ID>"),
]


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add ``clean`` (masked text) and ``n_pii`` (total matches masked)
    to each row. Match counts are taken per pattern BEFORE that
    pattern's replacement, on the text as already masked by earlier
    patterns — exactly the sequential semantics the SQL twin nests."""
    text = pc.fill_null(batch[text_col], "")
    total = None
    for _, pat, repl in PII_PATTERNS:
        n = pc.count_substring_regex(text, pat)
        total = n if total is None else pc.add(total, n)
        text = pc.replace_substring_regex(text, pat, repl)
    return batch.append_column("clean", text).append_column(
        "n_pii", pc.cast(total, pa.int64())
    )
