"""Identifier extraction + checksum validation — the reference's
ID-pattern family (reference: src/ai_service/data/patterns/identifiers.py,
SURVEY.md §2.8 "ID/passport/IBAN regex families"): detect INN / EDRPOU /
OGRN / IBAN tokens in text with RE2 patterns and validate each hit with
the same published checksum algorithms the reference implements
(identifiers.py:328-470) — Russian INN-10 weighted mod-11, Ukrainian
INN-10 digit-sum mod-10 (validate_inn tries RU then UA), EDRPOU-8
two-stage weighted mod-11, OGRN-13 leading-12 mod-11, IBAN ISO-13616
rearranged mod-97.

Scale shape: extraction is one ``pyarrow.compute.extract_regex`` per
pattern per batch (C++ RE2, first hit per doc — the synth corpus plants
exactly one); validation is numpy digit arithmetic over the hit subset
(fixed-width slice → int64 columns; the IBAN's 31-digit number folds
through a chunked mod-97 so nothing leaves int64). No shuffle at all —
the operator is a pure streaming map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ASCII-marker RE2 patterns (\b is ASCII in RE2 on both Arrow and
# DuckDB, so markers stay ASCII for byte-identical match sets)
IDENTIFIER_PATTERNS: list[tuple[str, str]] = [
    ("inn10", r"\binn[:\s]+(?P<v>\d{10})\b"),
    ("edrpou", r"\bedrpou[:\s]+(?P<v>\d{8})\b"),
    ("ogrn", r"\bogrn[:\s]+(?P<v>\d{13})\b"),
    ("iban", r"\b(?P<v>UA\d{27})\b"),
]


def _digit_matrix(vals: pd.Series, width: int, offset: int = 0) -> np.ndarray:
    """(n, width) int64 digit matrix from fixed-width numeric strings."""
    out = np.empty((len(vals), width), dtype=np.int64)
    for j in range(width):
        out[:, j] = vals.str.slice(offset + j, offset + j + 1).astype(np.int64)
    return out


def _valid_inn10(vals: pd.Series) -> np.ndarray:
    """validate_inn for 10 digits: Russian weighted mod-11 (check > 9 →
    mod 10) OR the Ukrainian digit-sum mod-10 (identifiers.py:347-393)."""
    d = _digit_matrix(vals, 10)
    w = np.array([2, 4, 10, 3, 5, 9, 4, 6, 8], dtype=np.int64)
    ru_check = (d[:, :9] * w).sum(axis=1) % 11
    ru_check = np.where(ru_check > 9, ru_check % 10, ru_check)
    ua_check = d[:, :9].sum(axis=1) % 10
    return (d[:, 9] == ru_check) | (d[:, 9] == ua_check)


def _valid_edrpou8(vals: pd.Series) -> np.ndarray:
    """validate_edrpou 8-digit: weights 1..7 mod 11; if > 9 retry with
    weights 3..9; still > 9 → 0 (identifiers.py:395-421)."""
    d = _digit_matrix(vals, 8)
    w1 = np.arange(1, 8, dtype=np.int64)
    w2 = np.arange(3, 10, dtype=np.int64)
    c1 = (d[:, :7] * w1).sum(axis=1) % 11
    c2 = (d[:, :7] * w2).sum(axis=1) % 11
    check = np.where(c1 > 9, np.where(c2 > 9, 0, c2), c1)
    return d[:, 7] == check


def _valid_ogrn13(vals: pd.Series) -> np.ndarray:
    """validate_ogrn: first 12 digits mod 11, remainder 10 → 0
    (identifiers.py:428-445)."""
    first12 = vals.str.slice(0, 12).astype(np.int64)
    check = first12 % 11
    check = np.where(check == 10, 0, check)
    return vals.str.slice(12, 13).astype(np.int64) == check


def _valid_iban_ua(vals: pd.Series) -> np.ndarray:
    """ISO 13616 mod-97: move the leading 'UAcc' to the end, digitize
    (U→30, A→10), remainder must be 1. The UA+27-digit form digitizes to
    31 digits — folded through int64 with a chunked mod (9-digit chunks:
    97 · 10⁹ ≪ 2⁶³)."""
    # rearranged numeric string: body(25 digits) + '3010' + check(2)
    s = vals.str.slice(4) + "3010" + vals.str.slice(2, 4)
    m = np.zeros(len(vals), dtype=np.int64)
    total = 31
    pos = 0
    while pos < total:
        w = min(9, total - pos)
        chunk = s.str.slice(pos, pos + w).astype(np.int64)
        m = (m * np.int64(10**w) + chunk) % np.int64(97)
        pos += w
    return m == 1


_VALIDATORS = {
    "inn10": _valid_inn10,
    "edrpou": _valid_edrpou8,
    "ogrn": _valid_ogrn13,
    "iban": _valid_iban_ua,
}

_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("id_type", pa.string()),
    ("id_value", pa.string()),
    ("valid", pa.int64()),
])


def extract_identifiers_batch(batch: pa.Table, text_col: str = "text",
                              id_col: str = "doc_id") -> pa.Table:
    """One batch → (doc_id, id_type, id_value, valid) rows, one row per
    pattern hit (first hit per doc per pattern, matching the SQL twin's
    ``regexp_extract``)."""
    text = batch[text_col]
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    parts = []
    for id_type, pattern in IDENTIFIER_PATTERNS:
        ext = pc.extract_regex(text, pattern)
        hit = pc.is_valid(ext)
        if not pc.any(hit).as_py():
            continue
        hit_np = hit.to_numpy(zero_copy_only=False)
        vals = pd.Series(pc.struct_field(ext, "v").drop_null().to_pylist())
        valid = _VALIDATORS[id_type](vals).astype(np.int64)
        parts.append(pa.table({
            "doc_id": pa.array(ids[hit_np], pa.int64()),
            "id_type": pa.array(np.repeat(id_type, int(hit_np.sum()))),
            "id_value": pa.array(vals.to_numpy(dtype=object), pa.string()),
            "valid": pa.array(valid, pa.int64()),
        }))
    if not parts:
        return _OUT_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def extract_identifiers(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset-level wrapper: streaming flat-map, no shuffle."""
    return ds.map_batches(
        lambda b: extract_identifiers_batch(b, text_col, id_col),
        batch_format="pyarrow",
    )
