"""Russian + Ukrainian suffix-stripping stemmers — from-scratch
Porter-style implementations. ``stem_ru`` follows the published
Snowball "russian" algorithm (snowballstem.org algorithm description,
public knowledge); ``stem_uk`` applies the same RV/R2 region machinery
with Ukrainian inflection classes (standard public grammar: case
endings incl. -ові/-еві/-ів, verb endings incl. -ти/-ємо/-ує, gerunds
in -чи/-вши, comparative -іш-), since no official Snowball Ukrainian
exists. These are the lightweight stand-ins for the reference's
morphology layer (reference:
src/ai_service/layers/normalization/morphology_adapter.py:74-258 uses
pymorphy3 ru+uk lemmatization — unavailable here): suffix stripping
conflates the bulk of the inflection classes (case endings, verb
forms, participles), which is the recall lever the reference's
morphology provides for name/text matching, at a fraction of the cost
and with zero dictionaries.

A small table of genuinely suppletive forms (plural stems unrelated to
the singular: люди/людина, діти/дитина, …) is consulted before the
algorithmic pass — the one class of paradigm no suffix-stripper can
conflate (the reference covers these through pymorphy's dictionary).

Exactness caveat (stated, not hidden): a stemmer is NOT a lemmatizer —
irregular paradigms beyond the exception table (е/ё alternations
already folded by the analyzer) won't conflate, and distinct lemmas
can collide. For BM25 recall that tradeoff is the standard one
(Snowball is what Elasticsearch's ``russian`` analyzer uses too).
"""

from __future__ import annotations

# suppletive paradigms: algorithmically unreachable conflations, applied
# before suffix stripping (keys are analyzer-normalized lowercase forms;
# values chosen to coincide with what the singular paradigm's oblique
# forms stem to, so plural and singular meet at one stem)
_SUPPLETIVE_RU: dict[str, str] = {
    # люди → человек(а→"человек"); дети → ребенк(а→"ребенк"; ё folded)
    "люди": "человек", "людей": "человек", "людям": "человек",
    "людьми": "человек", "людях": "человек",
    "дети": "ребенк", "детей": "ребенк", "детям": "ребенк",
    "детьми": "ребенк", "детях": "ребенк",
}

_SUPPLETIVE_UK: dict[str, str] = {
    # люди → людин(а→"людин"); діти → дитин(а→"дитин")
    "люди": "людин", "людей": "людин", "людям": "людин",
    "людьми": "людин", "людях": "людин",
    "діти": "дитин", "дітей": "дитин", "дітям": "дитин",
    "дітьми": "дитин", "дітях": "дитин",
}

_VOWELS = "аеиоуыэюя"

_PERFECTIVE_GERUND_1 = ("вшись", "вши", "в")          # must follow а/я
_PERFECTIVE_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_REFLEXIVE = ("ся", "сь")
_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ею", "ою", "ую", "юю", "ая", "яя",
)
_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")          # must follow а/я
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_VERB_1 = (
    "ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)  # must follow а/я
_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
)
_NOUN = (
    "иями", "ями", "ами", "иях", "иям", "ием", "ией",
    "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом",
    "ах", "ях", "ию", "ью", "ия", "ья", "ев", "ов", "ие",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
_SUPERLATIVE = ("ейше", "ейш")
_DERIVATIONAL = ("ость", "ост")


def _regions(word: str) -> tuple[int, int]:
    """(rv, r2) start offsets per the Snowball definitions."""
    rv = len(word)
    for i, c in enumerate(word):
        if c in _VOWELS:
            rv = i + 1
            break
    # R1: after first non-vowel following a vowel; R2: same within R1
    def _r(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
                return i + 2
        return len(word)

    r1 = _r(0)
    r2 = _r(r1)
    return rv, r2


def _strip(word: str, rv: int, endings: tuple[str, ...], need_ay: bool = False) -> str | None:
    """Remove the first matching ending that lies inside RV (optionally
    requiring the preceding letter to be а/я, which stays)."""
    for e in endings:
        if word.endswith(e) and len(word) - len(e) >= rv:
            if need_ay:
                stem = word[: -len(e)]
                if not stem or stem[-1] not in "ая":
                    continue
            return word[: -len(e)]
    return None


def stem_ru(word: str) -> str:
    """Snowball russian stem of a lowercase word. Non-Cyrillic input is
    returned unchanged."""
    if not word or not ("а" <= word[0] <= "я" or word[0] == "ё"):
        return word
    word = word.replace("ё", "е")
    exc = _SUPPLETIVE_RU.get(word)
    if exc is not None:
        return exc
    rv, r2 = _regions(word)

    # Step 1: perfective gerund, else [reflexive] + adjectival|verb|noun
    out = _strip(word, rv, _PERFECTIVE_GERUND_2) or _strip(word, rv, _PERFECTIVE_GERUND_1, need_ay=True)
    if out is None:
        w = _strip(word, rv, _REFLEXIVE) or word
        # adjectival = adjective, optionally preceded by a participle
        adj = _strip(w, rv, _ADJECTIVE)
        if adj is not None:
            part = _strip(adj, rv, _PARTICIPLE_2) or _strip(adj, rv, _PARTICIPLE_1, need_ay=True)
            out = part if part is not None else adj
        else:
            out = _strip(w, rv, _VERB_2) or _strip(w, rv, _VERB_1, need_ay=True)
            if out is None:
                out = _strip(w, rv, _NOUN)
            if out is None:
                out = w
    word = out

    # Step 2: trailing и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # Step 3: derivational ending in R2
    for e in _DERIVATIONAL:
        if word.endswith(e) and len(word) - len(e) >= r2:
            word = word[: -len(e)]
            break

    # Step 4: нн → н | superlative (+ нн → н) | trailing ь
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        sup = _strip(word, rv, _SUPERLATIVE)
        if sup is not None:
            word = sup
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        if word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word


# --- Ukrainian ---------------------------------------------------------------

_VOWELS_UK = "аеиоуіїєюя"

# gerunds: -вши(сь) after а/я (прочитавши), -ивши/-івші/-ївши, past-stem
# -ив/-ів/-їв (зробив, купив) and the -чи adverbial forms (читаючи)
_PG_UK_1 = ("вшись", "вши", "в")                      # must follow а/я
_PG_UK_2 = ("ившись", "івшись", "ївшись", "ивши", "івши", "ївши",
            "учи", "ючи", "ачи", "ячи", "ив", "ів", "їв")
_REFLEXIVE_UK = ("ся", "сь")
_ADJECTIVE_UK = (
    "ього", "ьому", "ьої", "ьою", "іший", "ішої", "ішому", "ішим",
    "ими", "іми", "ого", "ому", "ої", "ою", "их", "іх",
    "ій", "ий", "им", "ім", "єє", "єю", "яя", "юю",
)
_PARTICIPLE_UK_1 = ("вш", "нн")                        # must follow а/я
_PARTICIPLE_UK_2 = ("івш", "ївш", "уюч", "ююч", "ач", "яч", "уч", "юч")
_VERB_UK_1 = (
    "ти", "ла", "на", "ли", "ло", "но", "ємо", "єте", "єш", "є",
    "ють", "йте", "й", "л", "н",
)  # must follow а/я
_VERB_UK_2 = (
    "ила", "іла", "їла", "ило", "іло", "їло", "или", "іли", "їли",
    "имо", "імо", "ите", "іте", "ить", "іть", "ять", "ать",
    "уть", "усь", "ує", "ують", "уєш", "уємо", "уєте", "ував", "увала",
    "увати", "иш", "їш",
)
_NOUN_UK = (
    "іями", "ями", "ами", "іях", "ях", "ах", "іям", "ям", "ам",
    "ією", "ею", "ою", "ові", "еві", "єві", "ії", "ій", "ів", "їв",
    "ем", "єм", "ом", "ей",
    "а", "е", "є", "и", "і", "ї", "й", "о", "у", "ь", "ю", "я",
)
_SUPERLATIVE_UK = ("іш", "ійш")
_DERIVATIONAL_UK = ("ість", "іст")

_UK_EXTRA = set("іїєґ")


def _regions_uk(word: str) -> tuple[int, int]:
    rv = len(word)
    for i, c in enumerate(word):
        if c in _VOWELS_UK:
            rv = i + 1
            break

    def _r(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _VOWELS_UK and word[i + 1] not in _VOWELS_UK:
                return i + 2
        return len(word)

    r1 = _r(0)
    r2 = _r(r1)
    return rv, r2


def stem_uk(word: str) -> str:
    """Ukrainian stem of a lowercase word (Porter/Snowball-russian
    structure over Ukrainian suffix classes). Non-Cyrillic input is
    returned unchanged; Russian-only letters (ы/э/ё) pass through the
    Ukrainian vowel set unharmed (they just never match a suffix)."""
    if not word or not (
        "а" <= word[0] <= "я" or word[0] == "ё" or word[0] in _UK_EXTRA
    ):
        return word
    exc = _SUPPLETIVE_UK.get(word)
    if exc is not None:
        return exc
    rv, r2 = _regions_uk(word)

    # Step 1: gerund, else [reflexive] + adjectival|verb|noun
    out = _strip(word, rv, _PG_UK_2) or _strip(word, rv, _PG_UK_1, need_ay=True)
    if out is None:
        w = _strip(word, rv, _REFLEXIVE_UK) or word
        adj = _strip(w, rv, _ADJECTIVE_UK)
        if adj is not None:
            part = _strip(adj, rv, _PARTICIPLE_UK_2) or _strip(
                adj, rv, _PARTICIPLE_UK_1, need_ay=True
            )
            out = part if part is not None else adj
        else:
            out = _strip(w, rv, _VERB_UK_2) or _strip(w, rv, _VERB_UK_1, need_ay=True)
            if out is None:
                out = _strip(w, rv, _NOUN_UK)
            if out is None:
                out = w
    word = out

    # Step 2: trailing и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # Step 3: derivational ending in R2
    for e in _DERIVATIONAL_UK:
        if word.endswith(e) and len(word) - len(e) >= r2:
            word = word[: -len(e)]
            break

    # Step 4: нн → н | comparative/superlative -іш- (+ нн → н) | trailing ь
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        sup = _strip(word, rv, _SUPERLATIVE_UK)
        if sup is not None:
            word = sup
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        if word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word


# --- name-field conflation: diminutive → canonical given-name stems --------
#
# The reference resolves Slavic given-name diminutives through pymorphy's
# dictionary + dedicated rules (reference:
# layers/normalization/morphology_adapter.py:74-258, morphology/
# gender_rules.py): Саша and Александр must conflate when screening
# names, and no suffix-stripper can reach that — the diminutive stem is
# SUPPLETIVE with respect to the full name. These tables map the
# Snowball STEM of each high-frequency diminutive paradigm to the
# Snowball stem of its canonical full name (values are asserted equal
# to ``stem_xx(full-name form)`` in tests/test_stemmer.py), so every
# inflection of the diminutive (Саша/Сашей/Сашу → саш) lands on the
# canonical stem in one dict hop after the algorithmic pass.
#
# NAME-FIELD ONLY: several keys collide with common nouns (жен(а) →
# Евгений, кол → Николай), which is exactly why the reference applies
# morphology-based name resolution only inside its name-matching layer.
# Use ``stem="ru_names"`` / ``stem="uk_names"`` on fields that hold
# person names; general text keeps plain "ru"/"uk".

_DIMINUTIVE_RU: dict[str, str] = {
    "саш": "александр", "шур": "александр",
    "вов": "владимир", "волод": "владимир",
    "дим": "дмитр", "мит": "дмитр",
    "кол": "никола",
    "пет": "петр",
    "миш": "миха",
    "жен": "евген",
    "кат": "екатерин",
    "лен": "ел",
    "наташ": "натал",
    "маш": "мар",
    "сереж": "серг",
    "тан": "татья",
    "ван": "ива",
    "паш": "павел",
    "леш": "алекс", "алеш": "алекс",
    "андрюш": "андр",
    "кост": "константин",
    "люд": "людм",
    "свет": "светла",
    # paradigm repair (not a diminutive): Snowball splits Михаил's own
    # paradigm — михаила→"миха" but михаилу→"михаил"; pin both to "миха"
    "михаил": "миха",
}

_DIMINUTIVE_UK: dict[str, str] = {
    "сашк": "олександр",
    "вов": "володимир",
    "дмитрик": "дмитр",
    "миколк": "микол",
    "петрик": "петр",
    "михайлик": "михайл",
    "жен": "євген",
    "кат": "катерин",
    "оленк": "олен",
    "наталк": "наталі",
    "мар": "марі",
    "сергійк": "серг",
    "тан": "тетя",
    "іванк": "іва",
    "васьк": "васил",
    "павлик": "павл",
    "андрійк": "андр",
}


# the generated wide tables (tools/audit_diminutives.py --emit, derived
# from the reference's full diminutive resolution surface — data/
# diminutives_ru.json / diminutives_uk.json behind diminutive_resolver.py)
# extend the curated cores above; curated entries win on key collision.
from hybrid_sanctions_search_engine_ray.functions._diminutive_gen import (  # noqa: E402
    GEN_DIMINUTIVE_RU,
    GEN_DIMINUTIVE_UK,
)

_DIM_RU_ALL: dict[str, str] = {**GEN_DIMINUTIVE_RU, **_DIMINUTIVE_RU}
_DIM_UK_ALL: dict[str, str] = {**GEN_DIMINUTIVE_UK, **_DIMINUTIVE_UK}


def name_stem_ru(word: str) -> str:
    """Russian name-field stem: suppletive-diminutive conflation after
    the algorithmic Snowball pass (Саша/Сашей/Шуре and
    Александр/Александром all → "александр").

    Surname paradigm repair (reference: morphology/gender_rules.py
    FEMALE_SUFFIXES_RU — the feminine↔masculine surname surface):
    Snowball strips -ов/-ев from a masculine NOMINATIVE surname
    (иванов→иван) while every other form of the same paradigm — the
    feminine nominative иванова, both genders' oblique cases, the
    plural — stems to "иванов". Keeping the nominative's own shape as
    its stem rejoins the paradigm, so Иванов/Иванова/Ивановой all
    conflate (and Иванов no longer collides with the given name Иван).
    -ин/-ын nominatives need no repair (путин→путин already)."""
    if len(word) >= 5 and word.endswith(("ов", "ев", "ёв")):
        s = word.replace("ё", "е")  # Snowball folds ё→е; the guard must too
    else:
        s = stem_ru(word)
    return _DIM_RU_ALL.get(s, s)


def name_stem_uk(word: str) -> str:
    """Ukrainian name-field stem (see :func:`name_stem_ru`)."""
    s = stem_uk(word)
    return _DIM_UK_ALL.get(s, s)
