"""Golden-case analyzer parity suite — modeled on the reference's golden
normalization corpus (reference: tests/golden_cases/golden_cases.json —
31 cases over NFKC, homoglyphs, initials, dates, apostrophes/hyphens,
transliteration; and unicode_service.py:295-394 invisible-char +
encoding-recovery handling). Each case pins the FULL analyzer chain's
output; the simple-mode cases pin 3-way parity (Python / Arrow / the
DuckDB-oracle class semantics) on Unicode edge input.
"""

import unicodedata

import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.functions.analyzer import (
    normalize_full,
    recover_encoding,
    tokenize_full,
    tokenize_simple,
)
from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

# (case id, input, expected full-mode tokens)
GOLDEN_FULL = [
    # --- casefold + basics ---
    ("ascii_case", "Ivan PETROV", ["ivan", "petrov"]),
    ("cyr_case", "ИВАНОВ Иван", ["иванов", "иван"]),
    ("mixed_ws", "  иван\t\tпетров\n", ["иван", "петров"]),
    # --- NFKC compatibility forms ---
    ("fullwidth", "Ｉｖａｎ", ["ivan"]),
    ("ligature_fi", "ﬁnancial", ["financial"]),
    ("superscript", "m²", ["m2"]),
    ("nfd_accent", unicodedata.normalize("NFD", "café"), ["café"]),
    # --- transliteration map ---
    ("yo_fold", "Ёлкин ёжик", ["елкин", "ежик"]),
    ("eszett", "Straße GROẞE", ["strasse", "grosse"]),
    # --- apostrophe variants ---
    ("apostrophe_rsquo", "O’Brien", ["o'brien"]),
    ("apostrophe_modifier", "OʼConnor", ["o'connor"]),
    ("apostrophe_backtick", "O`Neil", ["o'neil"]),
    # --- hyphen/dash variants ---
    ("en_dash", "Jean–Pierre", ["jean-pierre"]),
    ("em_dash", "Jean—Luc", ["jean-luc"]),
    ("minus_sign", "Anna−Maria", ["anna-maria"]),
    # --- homoglyph fold to dominant script ---
    ("homoglyph_cyr_dominant", "Идaнoв", ["иданов"]),     # latin a,o in cyrillic word
    ("homoglyph_lat_dominant", "Ivаn Pеtrov", ["ivan", "petrov"]),  # cyrillic а,е in latin words
    ("no_fold_pure_scripts", "ivan иван", ["ivan", "иван"]),
    # --- compound initials ---
    ("initials_compound", "А.С.Пушкин", ["а", "с", "пушкин"]),
    ("initials_latin", "J.R.R.Tolkien", ["j", "r", "r", "tolkien"]),
    ("initial_single", "и. иванов", ["и", "иванов"]),
    # --- date exclusion ---
    ("date_iso", "payment 1980-01-01 ivan", ["payment", "ivan"]),
    ("date_dots", "25.12.1990 мария", ["мария"]),
    ("date_slash", "01/02/2003 test", ["test"]),
    ("not_a_date", "v1.2.3.4 stays", ["v1", "2", "3", "4", "stays"]),  # compound-split, kept
    # --- noise strip ---
    ("punct_noise", "ivan@example.com #tag", ["ivan", "example", "com", "tag"]),
    ("currency", "оплата 100$ (грн)", ["оплата", "100", "грн"]),
    ("double_dots", "и..иванов", ["и", "иванов"]),
    # --- invisible characters (unicode_service.py:295-394) ---
    ("zwsp", "iva​n", ["ivan"]),
    ("zwnj_zwj", "пет‌р‍ов", ["петров"]),
    ("bom_softhyphen", "﻿soft­ware", ["software"]),
    ("bidi_marks", "‎ivan‏", ["ivan"]),
    # --- encoding recovery (mojibake) ---
    ("mojibake_latin", "cafÃ©", ["café"]),
    ("mojibake_cyr", "Ð¿ÐµÑ‚Ñ€Ð¾Ð²", ["петров"]),
    ("mojibake_untouched", "Señor Ñoño", ["señor", "ñoño"]),
    # --- identifiers survive ---
    ("itn_number", "ИНН 123456789012", ["инн", "123456789012"]),
]


@pytest.mark.parametrize("case_id,text,expected", GOLDEN_FULL, ids=[c[0] for c in GOLDEN_FULL])
def test_golden_full_analyzer(case_id, text, expected):
    assert tokenize_full(text) == expected


@pytest.mark.parametrize("case_id,text,expected", GOLDEN_FULL, ids=[c[0] for c in GOLDEN_FULL])
def test_golden_full_idempotent(case_id, text, expected):
    toks = tokenize_full(text)
    assert tokenize_full(" ".join(toks)) == toks


def test_recover_encoding_strictness():
    # legit Ã-bearing text whose cp1252 bytes are NOT valid UTF-8 → untouched
    assert recover_encoding("Ãx") == "Ãx"
    assert recover_encoding("plain ascii") == "plain ascii"


# --- simple-mode 3-way parity on Unicode edges ------------------------------

SIMPLE_EDGE = [
    unicodedata.normalize("NFD", "café naïve"),  # decomposed accents
    "x̃y combining",                        # mark with no composed form
    "İstanbul kebab",                            # lower() SpecialCasing divergence
    "ЁЖИК Größe 42",
]


@pytest.mark.parametrize("text", SIMPLE_EDGE)
def test_simple_mode_python_arrow_parity(text):
    """Query-side (Python regex) and index-side (Arrow RE2) tokenization
    must agree even on NFD / combining-mark / special-casing input."""
    py = tokenize_simple(text)
    _, terms = flat_terms(pa.table({"text": [text]}), AnalyzerConfig())
    assert py == terms.to_pylist()


# --- reference golden-corpus inputs (round-3 parity evidence) ----------------
# The 31 INPUT strings of the reference's golden normalization corpus
# (reference: tests/golden_cases/golden_cases.json), run through OUR full
# analyzer chain. Expected outputs are re-derived for the index-analyzer
# contract (the reference pins role-tagged/lemmatized personas — a
# screening feature outside the lexical scope, SURVEY.md §7.4): casefold,
# NFKC, homoglyph fold, ё→е, date-pattern exclusion, hyphen/apostrophe
# preservation inside compound names, punctuation strip.
GOLDEN_REFERENCE_INPUTS = [
    ("ru_basic_full", "Иванов Иван Петрович", ["иванов", "иван", "петрович"]),
    ("ru_feminine_surname", "Мария Иванова", ["мария", "иванова"]),
    ("ru_declension_to_nominative", "платёж Ивану Петрову", ["платеж", "ивану", "петрову"]),
    ("ru_diminutive", "Сашка Пушкин", ["сашка", "пушкин"]),
    ("ru_initials", "Иванов И.И.", ["иванов", "и", "и"]),
    ("ru_hyphenated_surname", "Анна Петрова-Сидорова", ["анна", "петрова-сидорова"]),
    ("ru_apostrophe", "Ольга Д'яченко", ["ольга", "д'яченко"]),
    ("ru_context_words", "получатель: гражданин РФ Петр Сергеев",
     ["получатель", "гражданин", "рф", "петр", "сергеев"]),
    # Latin P + Cyrillic а — the homoglyph fold resolves to the dominant script
    ("ru_homoglyph", "Pаvlov", ["pavlov"]),
    ("ru_multiple_persons", "Иван Петров, Мария Иванова",
     ["иван", "петров", "мария", "иванова"]),
    ("uk_declension", "переказ Олені Петренко", ["переказ", "олені", "петренко"]),
    ("uk_feminine_suffix", "Наталія Ковальська", ["наталія", "ковальська"]),
    ("uk_diminutive", "Петрик Шевченко", ["петрик", "шевченко"]),
    ("uk_initials_preposition", "з О. Іваненко", ["з", "о", "іваненко"]),
    ("uk_ner_gate", "Президент України Володимир Зеленський",
     ["президент", "україни", "володимир", "зеленський"]),
    ("en_title_suffix", "Dr. John A. Smith Jr.", ["dr", "john", "a", "smith", "jr"]),
    ("en_nickname", "Bill Gates", ["bill", "gates"]),
    ("en_middle_name", "Mary Jane Watson", ["mary", "jane", "watson"]),
    ("en_apostrophe", "O'Connor, Sean", ["o'connor", "sean"]),
    ("en_double_surname", "Emily Blunt-Krasinski", ["emily", "blunt-krasinski"]),
    # date token 1980-01-01 excluded by the date-pattern rule (reference
    # token_processor.py:17-22); quotes/commas stripped
    ("mixed_org_noise", 'Оплата ТОВ "ПРИВАТБАНК" Ивану Петрову, 1980-01-01',
     ["оплата", "тов", "приватбанк", "ивану", "петрову"]),
    ("mixed_languages", "John Smith та Олена Петренко",
     ["john", "smith", "та", "олена", "петренко"]),
    ("mixed_diacritics", "Café José → оплата Івану", ["café", "josé", "оплата", "івану"]),
    ("mixed_function_words", "и в у о к з", ["и", "в", "у", "о", "к", "з"]),
    ("ru_single_surname", "Иванов", ["иванов"]),
    ("uk_passport", "Паспорт AB123456: Сергій Іванов",
     ["паспорт", "ab123456", "сергій", "іванов"]),
    ("uk_dob", "Іван Петров (1980-01-01)", ["іван", "петров"]),
    ("behavior_idempotent", "Петр Сергеев", ["петр", "сергеев"]),
    ("behavior_unknown_preserve", "Mr. John ??? Smith", ["mr", "john", "smith"]),
    ("behavior_case_policy", "иван ПЕТРОВ", ["иван", "петров"]),
    ("behavior_empty_input", "\t\n", []),
]


@pytest.mark.parametrize(
    "case_id,text,expected",
    GOLDEN_REFERENCE_INPUTS,
    ids=[c[0] for c in GOLDEN_REFERENCE_INPUTS],
)
def test_reference_golden_inputs_full(case_id, text, expected):
    assert tokenize_full(text) == expected


@pytest.mark.parametrize(
    "case_id,text,expected",
    GOLDEN_REFERENCE_INPUTS,
    ids=[c[0] for c in GOLDEN_REFERENCE_INPUTS],
)
def test_reference_golden_inputs_idempotent(case_id, text, expected):
    # re-analyzing the analyzer's own output is a fixpoint (the
    # reference's property gate, tests/property/test_idempotency.py)
    assert tokenize_full(" ".join(expected)) == expected


def test_reference_golden_inputs_simple_arrow_parity():
    """simple mode: the vectorized Arrow path must agree with the
    per-row Python tokenizer on every reference golden input."""
    texts = [c[1] for c in GOLDEN_REFERENCE_INPUTS]
    batch = pa.table({"text": pa.array(texts, pa.string()),
                      "doc_id": pa.array(range(len(texts)), pa.int64())})
    parent, terms = flat_terms(batch, AnalyzerConfig(mode="simple"))
    got: dict[int, list[str]] = {i: [] for i in range(len(texts))}
    for p, t in zip(parent.tolist(), terms.to_pylist()):
        got[p].append(t)
    for i, text in enumerate(texts):
        assert got[i] == tokenize_simple(text), GOLDEN_REFERENCE_INPUTS[i][0]
