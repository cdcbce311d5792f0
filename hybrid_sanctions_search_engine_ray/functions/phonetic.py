"""Phonetic matching — the name-screening signal at the heart of the
reference's sanctions domain (reference: fuzzy/phonetic candidate
recall in src/ai_service/layers/search — names that SOUND alike must
block together even when spelled apart).

Implemented: SIMPLIFIED American Soundex, defined by an explicit rule
sequence both this module and the SQL oracle share verbatim:

1. lowercase; only ``a-z`` input (callers pre-filter);
2. map every letter through the digit table (vowels + h/w/y → 0):
   ``SOUNDEX_TABLE[i]`` is the code of letter ``chr(ord('a')+i)``;
3. collapse ADJACENT equal digits over the whole coded string
   (including the first letter's code — 'pf…' collapses);
4. soundex = first LETTER + (rest of the collapsed code with the 0s
   removed), truncated/right-padded with '0' to 4 chars.

This is the classic table; the simplification is that ``h``/``w`` act
as separators like vowels (full Soundex treats them as transparent).
Deterministic, pure, and expressible as translate + chained
regexp_replace in DuckDB — the oracle shares the exact table string.
"""

from __future__ import annotations

import re

# a     b    c    d    e    f    g    h    i    j    k    l    m
# 0     1    2    3    0    1    2    0    0    2    2    4    5
# n     o    p    q    r    s    t    u    v    w    x    y    z
# 5     0    1    2    6    2    3    0    1    0    2    0    2
SOUNDEX_TABLE = "01230120022455012623010202"
assert len(SOUNDEX_TABLE) == 26

_TRANS = str.maketrans("abcdefghijklmnopqrstuvwxyz", SOUNDEX_TABLE)
_COLLAPSE = re.compile(r"([0-9])\1+")


def soundex(term: str) -> str:
    """Simplified American Soundex of a lowercase a-z term."""
    if not term:
        return ""
    coded = term.translate(_TRANS)
    collapsed = _COLLAPSE.sub(r"\1", coded)
    rest = collapsed[1:].replace("0", "")
    return term[0] + (rest + "000")[:3]
