import string

from hypothesis import given, settings
from hypothesis import strategies as st

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.functions.analyzer import (
    STOPWORDS,
    analyze,
    tokenize_full,
    tokenize_simple,
)

FULL = AnalyzerConfig(mode="full")
FULL_STOP = AnalyzerConfig(mode="full", remove_stopwords=True)


def test_simple_basic():
    assert tokenize_simple("Hello, World!  foo_bar 42") == ["hello", "world", "foo", "bar", "42"]


def test_simple_unicode():
    assert tokenize_simple("Пётр И.И. Сидоров-Петров") == ["пётр", "и", "и", "сидоров", "петров"]


def test_simple_empty():
    assert tokenize_simple("") == []
    assert tokenize_simple("  ... !!! ") == []


def test_full_translit_fold():
    # ё→е, ß→ss (reference token_processor.py:245-255)
    assert analyze("Ёжик пёс", FULL) == ["ежик", "пес"]
    assert analyze("Straße groß", FULL) == ["strasse", "gross"]


def test_full_apostrophe_hyphen_unify():
    assert analyze("O’Brien O'Brien", FULL) == ["o'brien", "o'brien"]
    assert analyze("Jean—Luc Jean-Luc", FULL) == ["jean-luc", "jean-luc"]


def test_full_compound_initials():
    # А.С.Пушкин → initials split (reference token_processor.py:257-280)
    assert analyze("А.С.Пушкин", FULL) == ["а", "с", "пушкин"]


def test_full_homoglyph_fold():
    # Latin 'a'/'o' inside a Cyrillic word folds to Cyrillic
    mixed = "Ивaнoв"  # 'a' and 'o' are Latin here
    assert analyze(mixed, FULL) == ["иванов"]


def test_full_date_exclusion():
    assert analyze("оплата 01.01.1980 и 1980-01-01 тут", FULL) == ["оплата", "и", "тут"]


def test_full_stopwords():
    toks = analyze("payment to Иванов от Петрова", FULL_STOP)
    assert "payment" not in toks and "от" not in toks
    assert "иванов" in toks


def test_full_nfkc():
    # fullwidth + ligature fold under NFKC
    assert analyze("ＡＢＣ ﬁle", FULL) == ["abc", "file"]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.ascii_letters + string.digits + " .,-'!№артко", max_size=80))
def test_idempotence_simple(text):
    once = tokenize_simple(text)
    again = tokenize_simple(" ".join(once))
    assert once == again


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="абвгдеёжикл ABCdef0123 .-'’—ßẞ", max_size=80))
def test_idempotence_full(text):
    once = tokenize_full(text)
    again = tokenize_full(" ".join(once))
    assert once == again


def test_stopwords_are_lowercase():
    assert all(w == w.lower() for w in STOPWORDS)


# --- M10 edge-char ignored_special_char rule ---------------------------------


def test_special_chars_removed_not_normalized():
    """ª/º/° etc. are REMOVED before NFKC (reference token_processor
    _apply_edge_character_rules) — NFKC alone would leak them into
    tokens as letters (ª→a)."""
    assert tokenize_full("Dona 3ª casa") == ["dona", "3", "casa"]
    assert tokenize_full("sala nº 7") == ["sala", "n", "7"]
    assert tokenize_full("25° outside") == ["25", "outside"]
    # the full trace set splits tokens where it appears
    assert tokenize_full("a§b c¶d e†f g•h i‰j") == \
        ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"]
    # primes (′ ″ ‴) and the reference mark ※ vanish too
    assert tokenize_full("45′12″ mark※note") == ["45", "12", "mark", "note"]


def test_special_chars_simple_mode_untouched():
    """simple mode is the SQL-parity tokenizer — it must keep splitting
    on these chars exactly as DuckDB's regexp does (no pre-strip)."""
    assert tokenize_simple("Dona 3ª casa") == ["dona", "3ª", "casa"]


# --- D5 duplicate-token removal ----------------------------------------------


def test_dedup_tokens_rule():
    from hybrid_sanctions_search_engine_ray.functions.analyzer import dedup_tokens

    # first occurrence kept, casefold comparison
    assert dedup_tokens(["Anna", "anna", "maria", "ANNA"]) == ["Anna", "maria"]
    # single-letter (initial-form) tokens always pass through
    assert dedup_tokens(["и", "и", "иванов", "иванов"]) == ["и", "и", "иванов"]
    # digits are NOT initials — they dedup normally
    assert dedup_tokens(["7", "7", "x"]) == ["7", "x"]
    assert dedup_tokens([]) == []


def test_dedup_analyzer_wiring():
    cfg = AnalyzerConfig(mode="simple", dedup_tokens=True)
    assert analyze("spark spark join spark", cfg) == ["spark", "join"]
    # full mode: initials survive the dedup (post-strip single letters)
    cfg_full = AnalyzerConfig(mode="full", dedup_tokens=True)
    assert analyze("И. И. Иванов Иванов", cfg_full) == ["и", "и", "иванов"]


def test_dedup_arrow_python_parity():
    """The vectorized simple-mode dedup path emits the same per-doc
    (term → tf) multiset as the Python analyzer (order-free contract)."""
    from collections import Counter

    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    texts = [
        "spark spark join filter join spark",
        "a a b 7 7 A",          # single letters keep counts (casefold 'A'→'a' too)
        "",
        "unique terms only here",
    ]
    cfg = AnalyzerConfig(mode="simple", dedup_tokens=True)
    parent, terms = flat_terms(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        cfg,
    )
    got = {}
    for d, t in zip(parent.tolist(), terms.to_pylist()):
        got.setdefault(d, Counter())[t] += 1
    want = {}
    for i, s in enumerate(texts):
        toks = analyze(s, cfg)
        if toks:
            want[i] = Counter(toks)
    assert got == want


def test_dedup_positional_refused():
    import pyarrow as pa
    import pytest

    from hybrid_sanctions_search_engine_ray.config import EngineConfig
    from hybrid_sanctions_search_engine_ray.stages.analyze import emit_postings_positional

    cfg = EngineConfig(analyzer=AnalyzerConfig(dedup_tokens=True))
    with pytest.raises(ValueError, match="dedup_tokens"):
        emit_postings_positional(
            pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["x y x"], pa.string())}), cfg)


# --- full-mode vectorized plain-row fast path ---------------------------------

_PLAIN_AL = string.ascii_letters + " ,;:!?()\"\t"
_MESSY_AL = _PLAIN_AL + "0123456789.-'ё߯ª°Ñ"


@settings(max_examples=120, deadline=None)
@given(st.lists(st.text(alphabet=_MESSY_AL, max_size=60), min_size=1, max_size=12))
def test_full_mode_fast_path_parity(texts):
    """flat_terms full-mode (plain-row Arrow fast path + Python rest)
    equals the per-row Python analyzer on every row, for any mix of
    plain-ASCII and messy rows."""
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    parent, terms = flat_terms(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        FULL,
    )
    got: dict[int, list[str]] = {}
    for d, t in zip(parent.tolist(), terms.to_pylist()):
        got.setdefault(d, []).append(t)
    want = {i: tokenize_full(s) for i, s in enumerate(texts) if tokenize_full(s)}
    assert got == want


def test_lang_col_routing_vs_script_detection():
    """Column-driven case routing (AnalyzerConfig.lang_col — the
    reference's request-level language parameter) vs per-string script
    detection: golden disagree cases, both modes exercised through
    flat_terms, plus an agreement case and a vec-path invariance case."""
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    texts = [
        "Straße Москва",    # detect: Cyrillic → ru branch (ß survives);
                             # routed lang=en → casefold (ß → ss)
        "ΟΔΥΣΣΕΥΣ",         # detect: no Cyrillic → casefold (σ);
                             # routed lang=ru → lower() (final ς)
        "Ёлка і ялинка",    # agree: Cyrillic detected, routed uk
        "путин москва",     # vec-eligible: identical under both modes
    ]
    langs = ["en", "ru", "uk", "en"]

    def run(cfg, with_lang):
        tbl = {"doc_id": pa.array(range(len(texts)), pa.int64()),
               "text": pa.array(texts, pa.string())}
        if with_lang:
            tbl["lang"] = pa.array(langs, pa.string())
        parent, terms = flat_terms(pa.table(tbl), cfg)
        got: dict[int, list[str]] = {}
        for d, t in zip(parent.tolist(), terms.to_pylist()):
            got.setdefault(d, []).append(t)
        return got

    detect = run(AnalyzerConfig(mode="full", lang_split_case=True), False)
    routed = run(AnalyzerConfig(mode="full", lang_split_case=True,
                                lang_col="lang"), True)

    # disagree case 1: ß survives the detected ru branch, folds to ss
    # under the routed en branch
    assert detect[0] == ["straße", "москва"]
    assert routed[0] == ["strasse", "москва"]
    # disagree case 2: final sigma under routed-ru lower(), plain sigma
    # under detected casefold()
    assert detect[1] == ["οδυσσευσ"]
    assert routed[1] == ["οδυσσευς"]
    # agreement: both modes take the ru/uk branch
    assert detect[2] == routed[2] == ["елка", "і", "ялинка"]
    # vec-path row: mode choice cannot change the output
    assert detect[3] == routed[3] == ["путин", "москва"]

    # per-row Python twin agrees with the column-driven stage
    for i, (s, lg) in enumerate(zip(texts, langs)):
        assert routed[i] == tokenize_full(s, lang_split_case=True, lang=lg)

    # lang_col set but column missing → loud failure
    import pytest

    with pytest.raises(ValueError, match="lang_col"):
        run(AnalyzerConfig(mode="full", lang_split_case=True,
                           lang_col="lang"), False)


_CYR_AL = ("абвгдеёжзийклмнопрстуфхцчшщъыьэюя" "АБВЕЁИЙКМНОПРСТУХ"
           "їієґЇІЄҐ" "abcdefgXYZ" " \t,!?()\"«»" "0123456789" ".-'ёÃ№ßΣ​"
           # code-review r05 hazard chars: '/' (slash dates must be
           # excluded whole on both paths) and Hangul conjoining jamo
           # (NFKC-identity per codepoint, composing at string level)
           "/가")


@settings(max_examples=120, deadline=None)
@given(st.lists(st.text(alphabet=_CYR_AL, max_size=60), min_size=1, max_size=12))
def test_full_mode_cyrillic_vec_path_parity(texts):
    """flat_terms full-mode with the NFKC-identity vectorized path
    (ru/uk-heavy rows in Arrow kernels, blacklisted rows in Python)
    equals the per-row Python analyzer on every row — including mixed
    Latin/Cyrillic homoglyph tokens, ё folding, typographic noise,
    dates, invisibles and Unicode specials."""
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    parent, terms = flat_terms(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        FULL,
    )
    got: dict[int, list[str]] = {}
    for d, t in zip(parent.tolist(), terms.to_pylist()):
        got.setdefault(d, []).append(t)
    want = {i: tokenize_full(s) for i, s in enumerate(texts) if tokenize_full(s)}
    assert got == want


def test_full_mode_fast_path_stopwords_and_dedup():
    import pyarrow as pa

    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    texts = ["The THE quick quick fox", "Ёлка ёлка 3ª test test"]
    for cfg in (AnalyzerConfig(mode="full", remove_stopwords=True),
                AnalyzerConfig(mode="full", dedup_tokens=True),
                AnalyzerConfig(mode="full", remove_stopwords=True, dedup_tokens=True)):
        parent, terms = flat_terms(
            pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            cfg,
        )
        got: dict[int, dict] = {}
        for d, t in zip(parent.tolist(), terms.to_pylist()):
            got.setdefault(d, {})
            got[d][t] = got[d].get(t, 0) + 1
        for i, s in enumerate(texts):
            toks = analyze(s, cfg)
            want = {}
            for t in toks:
                want[t] = want.get(t, 0) + 1
            assert got.get(i, {}) == want, (cfg, s)


def test_lang_split_case_routing():
    """lang_split_case=True reproduces normalize_for_ac's routing:
    lower() for Cyrillic-bearing strings (Latin specials keep their
    codepoints), casefold() otherwise (ß→ss, ﬁ→fi)."""
    from hybrid_sanctions_search_engine_ray.functions.analyzer import normalize_full

    # default: uniform casefold
    assert normalize_full("Straße") == "strasse"
    assert normalize_full("Straße по-русски") == "strasse по-русски"
    # split: pure-Latin still casefolds...
    assert normalize_full("Straße", lang_split_case=True) == "strasse"
    # ...but the ru/uk branch lowers, keeping ß
    assert normalize_full("Straße по-русски", lang_split_case=True) == "straße по-русски"
    # Cyrillic itself is identical under both rules
    assert (normalize_full("МОСКВА Київ", lang_split_case=True)
            == normalize_full("МОСКВА Київ") == "москва київ")
    # İ pre-fold holds on the lower() branch too (utf8proc/DuckDB parity)
    assert normalize_full("İstanbul и Москва", lang_split_case=True).startswith("istanbul")


def test_lang_split_case_through_config():
    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
    from hybrid_sanctions_search_engine_ray.functions.analyzer import get_analyzer

    an = get_analyzer(AnalyzerConfig(mode="full", lang_split_case=True))
    assert "straße" in an("Straße и Москва")
    an2 = get_analyzer(AnalyzerConfig(mode="full"))
    assert "strasse" in an2("Straße и Москва")
