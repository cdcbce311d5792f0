"""Input validation / sanitization stage.

Reference parity (reference: src/ai_service/utils/input_validation.py:
125-210 — SURVEY.md §2.2 M1): length cap (default 10 000 chars,
``:32``), empty/whitespace rejection, control-character strip,
truncate-don't-raise policy. Re-expressed as one vectorized
``map_batches`` function that annotates rather than throws — a batch
engine quarantines bad rows instead of failing a request.

Output adds: ``valid:bool``, ``truncated:bool``, ``reject_reason``
(empty string when valid). Use :func:`clean` to drop-and-truncate in
one step (the smart-filter skip-empty path, SURVEY.md §2.2 M2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_LEN = 10_000  # reference input_validation.py:32


def validate_batch(batch: pa.Table, max_len: int = MAX_LEN, text_col: str = "text") -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lengths = pc.utf8_length(text)
    trimmed = pc.utf8_trim_whitespace(text)
    is_empty = pc.or_(pc.is_null(text), pc.equal(pc.utf8_length(trimmed), 0))
    too_long = pc.greater(lengths, max_len)
    valid = pc.invert(is_empty)
    reason = pc.if_else(is_empty, "empty", "")
    return (
        batch.append_column("valid", valid)
        .append_column("truncated", too_long)
        .append_column("reject_reason", reason)
    )


# control characters to strip (keep \t \n \r; strip the rest of C0 + DEL)
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def clean(ds, max_len: int = MAX_LEN, text_col: str = "text"):
    """Drop empty rows, strip control chars, truncate over-long text —
    the lenient sanitize path (no row ever raises). Fully vectorized:
    Arrow regex replace + slice, no per-row Python."""

    def fn(batch: pa.Table) -> pa.Table:
        b = validate_batch(batch, max_len, text_col)
        b = b.filter(b["valid"])
        text = b[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        cleaned = pc.utf8_slice_codeunits(
            pc.replace_substring_regex(text, _CONTROL_RE, ""), 0, max_len
        )
        i = b.column_names.index(text_col)
        b = b.set_column(i, text_col, cleaned)
        return b.drop_columns(["valid", "truncated", "reject_reason"])

    return ds.map_batches(fn, batch_format="pyarrow")
