"""Russian suffix-stripping stemmer — a from-scratch implementation of
the published Snowball "russian" algorithm (Porter-style; snowballstem
.org algorithm description, public knowledge). This is the lightweight
stand-in for the reference's morphology layer (reference:
src/ai_service/layers/normalization/morphology_adapter.py:74-258 uses
pymorphy3 lemmatization — unavailable here): suffix stripping conflates
the bulk of Russian/Ukrainian-ish inflection classes (case endings,
verb forms, participles), which is the recall lever the reference's
morphology provides for name/text matching, at a fraction of the cost
and with zero dictionaries.

Exactness caveat (stated, not hidden): a stemmer is NOT a lemmatizer —
irregular paradigms (人 suppletive forms, е/ё alternations already
folded by the analyzer) won't conflate, and distinct lemmas can
collide. For BM25 recall that tradeoff is the standard one (Snowball
is what Elasticsearch's ``russian`` analyzer uses too).
"""

from __future__ import annotations

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
