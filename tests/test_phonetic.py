"""Simplified American Soundex (functions/phonetic.py)."""

from hybrid_sanctions_search_engine_ray.functions.phonetic import SOUNDEX_TABLE, soundex


def test_classic_reference_values():
    # the canonical Soundex test vectors (simplified h/w rule agrees here)
    assert soundex("robert") == "r163"
    assert soundex("rupert") == "r163"     # phonetic collision — the point
    assert soundex("tymczak") == "t522"
    assert soundex("pfister") == "p236"    # first-letter collapse (p,f both 1)
    assert soundex("jackson") == "j250"
    assert soundex("honeyman") == "h555"


def test_padding_truncation_and_edges():
    assert soundex("a") == "a000"
    assert soundex("ab") == "a100"
    assert soundex("") == ""
    # long consonant runs truncate at 4
    assert len(soundex("brzeczyszczykiewicz")) == 4
    assert len(SOUNDEX_TABLE) == 26


def test_duckdb_sql_parity():
    """The SQL twin's translate + chained-replace chain produces the
    SAME code for every pure-alpha term — the oracle's construction."""
    import duckdb

    terms = ["robert", "rupert", "pfister", "tymczak", "aaa", "zzz",
             "xylophone", "llama", "schwartz", "oooooh"]
    expr = f"translate(t, 'abcdefghijklmnopqrstuvwxyz', '{SOUNDEX_TABLE}')"
    for d in "0123456":
        expr = f"regexp_replace({expr}, '{d}{d}+', '{d}', 'g')"
    sql = (f"SELECT substr(t, 1, 1) || substr(rpad(replace(substr({expr}, 2), '0', ''),"
           f" 3, '0'), 1, 3) FROM (SELECT unnest(?::VARCHAR[]) AS t)")
    got = [r[0] for r in duckdb.sql(sql, params=[terms]).fetchall()]
    assert got == [soundex(t) for t in terms]
