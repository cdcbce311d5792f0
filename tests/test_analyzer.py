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
