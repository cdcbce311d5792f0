"""extract_identifiers: RE2 detection + the reference's checksum
algorithms (identifiers.py:328-470), hand-computed cases."""
import numpy as np
import pandas as pd
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.stages.identifiers import (
    _valid_edrpou8,
    _valid_iban_ua,
    _valid_inn10,
    _valid_ogrn13,
    extract_identifiers_batch,
)


def test_checksum_validators_hand_cases():
    # RU INN-10: weights [2,4,10,3,5,9,4,6,8] over 123456789 → check 4
    # UA INN-10: digit-sum of 123456789 = 45 → check 5
    assert _valid_inn10(pd.Series(["1234567894", "1234567895"])).all()
    assert not _valid_inn10(pd.Series(["1234567890", "1234567893"])).any()
    # EDRPOU-8: weights 1..7 over 1234567 → check 8
    assert _valid_edrpou8(pd.Series(["12345678"])).all()
    assert not _valid_edrpou8(pd.Series(["12345670"])).any()
    # OGRN-13: 123456789012 % 11 = 7
    assert _valid_ogrn13(pd.Series(["1234567890127"])).all()
    assert not _valid_ogrn13(pd.Series(["1234567890120"])).any()
    # IBAN mod-97 == 1 (check digits 51 for this body)
    assert _valid_iban_ua(pd.Series(["UA511234567890123456789012345"])).all()
    assert not _valid_iban_ua(pd.Series(["UA521234567890123456789012345"])).any()


def test_iban_chunked_mod_matches_bigint():
    rng = np.random.default_rng(5)
    vals = []
    for _ in range(50):
        body = "".join(str(d) for d in rng.integers(0, 10, 25))
        cc = str(rng.integers(0, 100)).zfill(2)
        vals.append("UA" + cc + body)
    got = _valid_iban_ua(pd.Series(vals))
    exp = np.array([int(v[4:] + "3010" + v[2:4]) % 97 == 1 for v in vals])
    assert (got == exp).all()


def test_extract_identifiers_batch():
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "account inn: 1234567894 verified",
            "company edrpou: 12345678 registry",
            "entity ogrn: 1234567890120 record",
            "payment iban UA511234567890123456789012345 transfer",
            "no identifiers in this row",
        ]),
    })
    out = extract_identifiers_batch(batch).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1, 2, 3, 4]
    assert list(out["id_type"]) == ["inn10", "edrpou", "ogrn", "iban"]
    assert list(out["valid"]) == [1, 1, 0, 1]
    assert out["id_value"].iloc[3] == "UA511234567890123456789012345"
