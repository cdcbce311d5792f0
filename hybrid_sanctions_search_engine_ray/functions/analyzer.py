"""Deterministic text analyzer — the single source of truth shared by the
index build, the query path, and the pure-Python test oracle.

Reproduces the semantics of the reference's lexical analyzer chain
(reference: src/ai_service/layers/patterns/high_recall_ac_generator.py:139-181
``TextCanonicalizer.normalize_for_ac``; src/ai_service/layers/normalization/
processors/token_processor.py:32-185 ``strip_noise_and_tokenize``;
src/ai_service/layers/unicode/unicode_service.py:295-503) re-implemented
from scratch as pure functions over strings. Two modes (AnalyzerConfig):

* ``simple`` — SQL-parity mode: ``lower(text)`` split on runs of
  non-(letter|digit). Byte-for-byte reproducible in DuckDB as
  ``regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+')``; this is what
  the driver's oracle gate checks.
* ``full`` — the reference chain: NFKC → apostrophe/hyphen unification →
  transliteration fold (ё→е, ß→ss) → homoglyph fold to dominant script →
  casefold → noise strip (keep letters/digits/``.-'``) → whitespace split →
  compound-initial split → date-token exclusion → optional stop words.

Both modes are idempotent at the token level:
``analyze(" ".join(analyze(t))) == analyze(t)`` (property-tested).
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig

# --- simple mode -----------------------------------------------------------

# Python \w == Unicode [L* N* M* Pc]; subtract '_'. One residual gap vs
# the Arrow/DuckDB `[^\p{L}\p{N}]+` class: \w keeps combining marks (M*)
# inside tokens while the RE2 class splits on them. Both paths therefore
# NFC-normalize first (composing the common mark sequences away) and the
# Python side additionally SPLITS tokens at any surviving mark, so index-
# side (Arrow), query-side (here) and the SQL oracle (which applies
# lower(nfc_normalize(text))) tokenize identically even on NFD input.
_SIMPLE_SPLIT = re.compile(r"[\W_]+", re.UNICODE)


def _split_residual_marks(tok: str) -> list[str]:
    # rare path: only tokens that still carry combining marks after NFC
    if tok.isascii() or not any(unicodedata.category(c).startswith("M") for c in tok):
        return [tok]
    out: list[str] = []
    cur: list[str] = []
    for c in tok:
        if unicodedata.category(c).startswith("M"):
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(c)
    if cur:
        out.append("".join(cur))
    return out


# Python str.lower() follows Unicode SpecialCasing and maps İ (U+0130) to
# "i" + COMBINING DOT ABOVE, while utf8proc (Arrow) and DuckDB lower it to
# plain "i" — pre-fold the one divergent codepoint before lowering.
_PRE_LOWER = {0x130: "i"}


def tokenize_simple(text: str) -> list[str]:
    text = unicodedata.normalize("NFC", text).translate(_PRE_LOWER).lower()
    return [
        p
        for t in _SIMPLE_SPLIT.split(text)
        if t
        for p in _split_residual_marks(t)
        if p
    ]


# --- char3 mode ------------------------------------------------------------
# The character-3-gram field of the reference's lexical tier (reference:
# templates/elasticsearch/elasticsearch_component_template.json:20-56
# char_ngram_analyzer, ngram 3-3): typo/partial-match recall. A document is
# represented by the DISTINCT set of 3-grams of its simple-mode tokens
# (whole token when shorter than 3 chars), so BM25 over this field scores
# with tf=1 per gram and dl=|gram set| — exactly SQL-expressible via
# substring + generate_series + DISTINCT (the driver oracle's form).


def char3_grams(token: str) -> list[str]:
    """All character 3-grams of one token (the token itself if len<3)."""
    if len(token) < 3:
        return [token]
    return [token[i : i + 3] for i in range(len(token) - 2)]


def tokenize_char3(text: str) -> list[str]:
    """simple-mode tokens → sorted distinct char-3-gram set."""
    grams: set[str] = set()
    for tok in tokenize_simple(text):
        grams.update(char3_grams(tok))
    return sorted(grams)


# --- edge-ngram (prefix) mode ------------------------------------------------
# The reference's autocomplete field (reference: elasticsearch_index_manager
# .py:307-310 edge_ngram tokenizer min_gram=2 max_gram=20; queried at
# elasticsearch_adapters.py:247-256 with operator "and"): a document is
# represented by the DISTINCT prefix set of its simple-mode tokens, so a
# partially-typed query term matches every document containing a word that
# starts with it. tf=1 per prefix, dl=|prefix set| (same set semantics as
# the char3 field) — SQL-expressible via substring(term,1,g) + DISTINCT.

EDGE_MIN_GRAM = 2
EDGE_MAX_GRAM = 20


def edge_grams(token: str) -> list[str]:
    """Prefixes of one token, lengths EDGE_MIN..min(len, EDGE_MAX); the
    whole token when shorter than EDGE_MIN (keeps 1-char tokens findable)."""
    n = len(token)
    if n < EDGE_MIN_GRAM:
        return [token]
    return [token[:g] for g in range(EDGE_MIN_GRAM, min(n, EDGE_MAX_GRAM) + 1)]


def tokenize_edge(text: str) -> list[str]:
    """simple-mode tokens → sorted distinct edge-ngram (prefix) set."""
    grams: set[str] = set()
    for tok in tokenize_simple(text):
        grams.update(edge_grams(tok))
    return sorted(grams)


# --- shingle mode ------------------------------------------------------------
# The word-shingle field of the reference's lexical tier (reference:
# templates/elasticsearch/elasticsearch_component_template.json:20-29,47-52
# shingle_analyzer: shingle filter min 2, max 3, output_unigrams=true):
# phrase-proximity recall without a positional index. A document is
# represented by its simple-mode tokens PLUS every space-joined run of 2
# and 3 adjacent tokens; BM25 over this field weights adjacent-word
# matches tf-style — exactly SQL-expressible via list slicing +
# generate_series (the driver oracle's form).


def tokenize_shingle(text: str) -> list[str]:
    """simple-mode tokens + word 2-/3-shingles (space-joined), in
    unigrams → 2-shingles → 3-shingles order."""
    toks = tokenize_simple(text)
    out = list(toks)
    out += [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    out += [f"{toks[i]} {toks[i + 1]} {toks[i + 2]}" for i in range(len(toks) - 2)]
    return out


# --- full mode -------------------------------------------------------------

# Apostrophe variants → ASCII ' (reference: high_recall_ac_generator.py:157)
_APOSTROPHES = dict.fromkeys(map(ord, "’ʼ‘`´"), ord("'"))
# Unicode hyphen/dash variants → ASCII - (reference: :160)
_HYPHENS = dict.fromkeys(map(ord, "−–—‐‑"), ord("-"))
# Fixed transliteration map (reference: token_processor.py:245-255)
_TRANSLIT = {ord("ё"): "е", ord("Ё"): "Е", ord("ß"): "ss", ord("ẞ"): "SS"}
# ru/uk branch of the lang-split case rule: ё folding applies (it's the
# reference's ru normalization), ß/ẞ pass through like the reference's
# raw lower() does
_TRANSLIT_RU_BRANCH = {ord("ё"): "е", ord("Ё"): "Е"}

# Latin↔Cyrillic confusables (standard Unicode confusable pairs; the
# reference folds these toward the dominant script — unicode_service.py:403-460)
_LAT2CYR = str.maketrans("AaBCcEeHKkMOoPpTXxy", "АаВСсЕеНКкМОоРрТХху")
_CYR2LAT = str.maketrans("АаВСсЕеНКкМОоРрТХху", "AaBCcEeHKkMOoPpTXxy")

_WS = re.compile(r"\s+")
# Noise strip: keep letters, digits, dot, hyphen, apostrophe, whitespace
# (reference: token_processor.py:81-88 preserves .-' and letter ranges)
_NOISE = re.compile(r"[^\w\s.\-']|_", re.UNICODE)
# Compound initials: "а.с.пушкин" → ["а.", "с.", "пушкин"] (token_processor.py:257-280)
_INITIAL_SPLIT = re.compile(r"(?<=\w\.)(?=\w)", re.UNICODE)
# Date tokens excluded by the reference tokenizer (token_processor.py:17-22)
_DATE = re.compile(r"^\d{1,4}[./-]\d{1,2}[./-]\d{1,4}$")
_DOTS = re.compile(r"\.{2,}")

# Compact multilingual stop-word list (en/ru/uk function words + the
# payment-context head the reference's STOP_ALL concept covers). Written
# from public knowledge — not copied from the reference dictionary.
STOPWORDS: frozenset[str] = frozenset(
    """
a an and are as at be but by for from has have if in into is it its of on or
that the this to was were will with not no than then so who what when
и в во не на я с со как а то все она они оно так его но да ты к у же вы за бы
по ее мне было вот от меня еще нет о из ему когда даже ну ли если уже или них
і в на не що з до як а то за у від про це так для
payment transfer invoice amount платеж платіж перевод оплата сумма сума
""".split()
)


def _dominant_script(text: str) -> str:
    cyr = sum("Ѐ" <= c <= "ӿ" for c in text)
    lat = sum(("a" <= c <= "z") or ("A" <= c <= "Z") for c in text)
    return "cyrillic" if cyr > lat else "latin"


def _fold_homoglyphs_token(tok: str) -> str:
    """Fold mixed-script tokens to their dominant script (per token, so a
    Latin word and a Cyrillic word in one text are both left intact)."""
    has_cyr = any("Ѐ" <= c <= "ӿ" for c in tok)
    has_lat = any(("a" <= c <= "z") or ("A" <= c <= "Z") for c in tok)
    if not (has_cyr and has_lat):
        return tok
    return tok.translate(_LAT2CYR) if _dominant_script(tok) == "cyrillic" else tok.translate(_CYR2LAT)


# Invisible / zero-width characters stripped before normalization
# (reference: unicode_service.py:295-394 invisible-char handling):
# ZWSP, ZWNJ, ZWJ, word joiner, BOM, soft hyphen, LRM/RLM.
_INVISIBLE = dict.fromkeys(
    map(ord, "​‌‍⁠﻿­‎‏"), None
)

# Edge-character "ignored_special_char" rule (reference:
# token_processor.py:228-243 _apply_edge_character_rules): ordinal
# indicators / degree / typographic marks are REMOVED (→ space), never
# normalized into letters. Applied BEFORE NFKC on purpose: NFKC maps
# ª→a / º→o, which would leak a spurious letter into tokens like "3ª"
# (the reference emits "3", not "3a").
_SPECIAL_IGNORED = dict.fromkeys(map(ord, "ªº°§¶†‡•‰′″‴※"), " ")

# Mojibake markers: UTF-8 bytes mis-decoded as cp1252 render as 'Ã©',
# 'Ð¸', 'Ñ\x82', 'â€¦' — lead bytes 0xC3/0xD0/0xD1/0xE2 seen as letters.
_MOJIBAKE_MARKERS = ("Ã", "Ð", "Ñ", "â€")


def recover_encoding(text: str) -> str:
    """Best-effort mojibake recovery (reference: unicode_service.py:
    295-360 encoding recovery): if the text contains cp1252-mojibake
    marker characters AND its cp1252 re-encoding is strictly valid
    UTF-8, decode it as UTF-8. Natural non-mojibake text containing
    'Ã'/'Ñ' fails the strict round-trip (the following byte is not a
    valid continuation), so the transform is effectively precise."""
    if not any(m in text for m in _MOJIBAKE_MARKERS):
        return text
    try:
        return text.encode("cp1252", errors="strict").decode("utf-8", errors="strict")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return text


_CYRILLIC = re.compile(r"[Ѐ-ӿ]")


def normalize_full(text: str, lang_split_case: bool = False,
                   lang: str | None = None) -> str:
    """The canonical normalization (pre-tokenization) for ``full`` mode.

    Case rule: uniform ``casefold()`` by default. The reference splits
    by language — ``lower()`` for ru/uk, ``casefold()`` for en
    (reference: high_recall_ac_generator.py:174-181
    ``normalize_for_ac``) — but the two are IDENTICAL on every Cyrillic
    codepoint (Unicode defines no full case foldings there), so the
    split only diverges on Latin specials like ``ß``→``ss`` /
    ``ﬁ``→``fi`` appearing inside text the reference would route to the
    ru/uk branch; there casefold is the strictly more recall-friendly
    choice for an index analyzer (both sides of a query/doc pair fold
    the same way). Deliberate, uniform, and cheaper than per-string
    language routing.

    ``lang_split_case=True`` reproduces the reference's routing
    faithfully (``casefold_by_language``: ``lower()`` for ru/uk,
    ``casefold()`` otherwise — a raw ``lower()``, so on that branch the
    Latin-special ß/ẞ translit entries are skipped too and the
    codepoints survive, exactly as they do through the reference's
    ru/uk path): a string containing any Cyrillic takes the ru/uk
    branch, anything else takes ``casefold()``. The approximation of
    the reference's language PARAMETER by per-string script detection
    is exact for its ru/uk/en routing on real inputs (the reference
    passes the detected language of the same string).

    ``lang`` (with ``lang_split_case=True``) replaces the per-string
    script detection with the reference's actual routing input — the
    DETECTED LANGUAGE of the request (``"ru"``/``"uk"`` → ``lower()``
    branch, anything else → ``casefold()``). Supplied per row from an
    M3 language column via ``AnalyzerConfig.lang_col``."""
    t = recover_encoding(text).translate(_INVISIBLE).translate(_SPECIAL_IGNORED)
    t = unicodedata.normalize("NFKC", t)
    t = t.translate(_APOSTROPHES).translate(_HYPHENS)
    if lang is not None:
        ru_branch = lang_split_case and lang in ("ru", "uk")
    else:
        ru_branch = lang_split_case and _CYRILLIC.search(t) is not None
    table = _TRANSLIT_RU_BRANCH if ru_branch else _TRANSLIT
    for src, dst in table.items():
        t = t.replace(chr(src), dst)
    t = _WS.sub(" ", t).strip()
    if ru_branch:
        return t.translate(_PRE_LOWER).lower()
    return t.casefold()


_EDGE_PUNCT = ".,;:!?()[]{}\"'"


def tokenize_full(text: str, remove_stopwords: bool = False,
                  lang_split_case: bool = False,
                  lang: str | None = None) -> list[str]:
    t = normalize_full(text, lang_split_case=lang_split_case, lang=lang)
    # date exclusion must run BEFORE the noise strip: slash dates
    # (01/02/2003) would otherwise be split into bare number tokens when
    # '/' is removed (reference: token_processor.py:17-22 checks raw
    # whitespace tokens)
    t = " ".join(w for w in t.split() if not _DATE.match(w.strip(_EDGE_PUNCT)))
    t = _NOISE.sub(" ", t)
    out: list[str] = []
    for raw in t.split():
        raw = _DOTS.sub(".", raw)  # collapse "и.." → "и."
        if _DATE.match(raw.strip(".-'")):
            continue  # date tokens excluded before initial-splitting
        for tok in _INITIAL_SPLIT.split(raw):
            tok = _fold_homoglyphs_token(tok)
            # strip edge punctuation; initials ("и.") index as bare letters,
            # a deliberate, idempotent simplification of the reference's
            # initial handling (token_processor.py:187-243 edge-char rules)
            tok = tok.strip(".-'")
            if not tok or not any(c.isalnum() for c in tok):
                continue
            if _DATE.match(tok):
                continue  # date tokens excluded
            if remove_stopwords and tok in STOPWORDS:
                continue
            out.append(tok)
    return out


def dedup_tokens(toks: list[str]) -> list[str]:
    """Duplicate-token removal (SURVEY §2 D5; reference:
    normalization_factory.py:940-998
    ``_deduplicate_consecutive_person_tokens``): keep the FIRST
    occurrence of each token under casefold comparison, except
    single-letter tokens (the post-edge-strip form of initials — the
    reference exempts ``X.``-style initials, which this analyzer's
    ``.-'`` strip reduces to one letter) which always pass through."""
    seen: set[str] = set()
    out: list[str] = []
    for t in toks:
        if len(t) == 1 and t.isalpha():
            out.append(t)
            continue
        k = t.casefold()
        if k not in seen:
            seen.add(k)
            out.append(t)
    return out


# --- public API ------------------------------------------------------------


@lru_cache(maxsize=8)
def get_analyzer(cfg: AnalyzerConfig):
    """Return a ``(text, lang=None) -> list[str]`` tokenizer for this
    config. ``lang`` is honored only by ``full`` mode with
    ``lang_split_case`` (the column-driven case routing of
    ``AnalyzerConfig.lang_col``); every other mode ignores it."""
    lo, hi = cfg.min_token_len, cfg.max_token_len
    if cfg.mode == "simple":
        if cfg.remove_stopwords:
            def base(text: str, lang: str | None = None) -> list[str]:
                return [t for t in tokenize_simple(text) if t not in STOPWORDS]
        else:
            def base(text: str, lang: str | None = None) -> list[str]:
                return tokenize_simple(text)
    elif cfg.mode == "char3":
        def base(text: str, lang: str | None = None) -> list[str]:
            return tokenize_char3(text)
    elif cfg.mode == "edge":
        def base(text: str, lang: str | None = None) -> list[str]:
            return tokenize_edge(text)
    elif cfg.mode == "shingle":
        def base(text: str, lang: str | None = None) -> list[str]:
            return tokenize_shingle(text)
    elif cfg.mode == "full":
        def base(text: str, lang: str | None = None) -> list[str]:
            return tokenize_full(text, remove_stopwords=cfg.remove_stopwords,
                                 lang_split_case=cfg.lang_split_case,
                                 lang=lang)
    else:
        raise ValueError(f"unknown analyzer mode: {cfg.mode}")

    if cfg.stem in ("ru", "uk", "ru_names", "uk_names"):
        if cfg.stem.endswith("_names") and not cfg.name_field:
            import warnings

            warnings.warn(
                f'stem="{cfg.stem}" conflates diminutive stems that collide '
                "with common nouns (жен(а)→Евгений, кол→Николай) and is safe "
                "only on person-name fields; set name_field=True on this "
                'AnalyzerConfig to confirm, or use stem="'
                f'{cfg.stem[:2]}" for general text',
                UserWarning, stacklevel=2)
        from hybrid_sanctions_search_engine_ray.functions.stemmer import (
            name_stem_ru,
            name_stem_uk,
            stem_ru,
            stem_uk,
        )

        stem_fn = {"ru": stem_ru, "uk": stem_uk,
                   "ru_names": name_stem_ru, "uk_names": name_stem_uk}[cfg.stem]
        inner = base

        def base(text: str, lang: str | None = None) -> list[str]:  # noqa: F811
            return [stem_fn(t) for t in inner(text, lang)]
    elif cfg.stem:
        raise ValueError(f"unknown stemmer: {cfg.stem}")

    if cfg.dedup_tokens:
        inner_d = base

        def base(text: str, lang: str | None = None) -> list[str]:  # noqa: F811
            return dedup_tokens(inner_d(text, lang))

    if lo <= 1 and hi >= 64:
        return base

    def bounded(text: str, lang: str | None = None) -> list[str]:
        return [t for t in base(text, lang) if lo <= len(t) <= hi]

    return bounded


def analyze(text: str, cfg: AnalyzerConfig | None = None,
            lang: str | None = None) -> list[str]:
    return get_analyzer(cfg or AnalyzerConfig())(text, lang)
