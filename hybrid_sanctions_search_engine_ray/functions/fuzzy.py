"""Fuzzy term matching — the Ray-Data re-expression of the reference's
fuzzy search tier (reference: src/ai_service/layers/search/
fuzzy_search_service.py:38-63 rapidfuzz ratio escalation, invoked from
hybrid_search_service.py:912-928 — SURVEY.md §2.8), built from scratch
on a banded Levenshtein kernel.

The scale design matches how Elasticsearch implements ``fuzziness``:
fuzzy matching runs against the TERM DICTIONARY (vocabulary-sized),
never the corpus — each query term expands to its nearby vocabulary
terms, and the expanded terms then ride the ordinary posting-list query
path. ``fuzzy_expand`` is therefore a ``map_batches`` over the
vocabulary Dataset with the (tiny) query-term list broadcast, followed
by a per-query-term top-n.

Edit distance is computed over UTF-8 BYTES (pass ``str``s and they are
encoded) — deliberately matching DuckDB's ``levenshtein`` semantics so
the driver's SQL oracle is exact; for ASCII terms byte- and
codepoint-distance coincide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def levenshtein(a: str | bytes, b: str | bytes, max_dist: int | None = None) -> int:
    """Levenshtein edit distance with an optional early-exit band.

    Over UTF-8 bytes when given ``str`` (DuckDB-``levenshtein`` parity).
    With ``max_dist`` set, returns ``max_dist + 1`` as soon as the
    distance provably exceeds it (Ukkonen band: only cells within
    ``max_dist`` of the diagonal can stay under the bound).
    """
    if isinstance(a, str):
        a = a.encode("utf-8")
    if isinstance(b, str):
        b = b.encode("utf-8")
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if max_dist is not None and lb - la > max_dist:
        return max_dist + 1
    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        bj = b[j - 1]
        lo = 1 if max_dist is None else max(1, j - max_dist)
        hi = la if max_dist is None else min(la, j + max_dist)
        if lo > 1:
            cur[lo - 1] = max_dist + 1  # out-of-band sentinel
        for i in range(lo, hi + 1):
            cost = 0 if a[i - 1] == bj else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        if hi < la:
            cur[hi + 1 :] = [max_dist + 1] * (la - hi)
        if max_dist is not None and min(cur[lo - 1 if lo > 1 else 0 : hi + 1]) > max_dist:
            return max_dist + 1
        prev, cur = cur, prev
    d = prev[la]
    return d if max_dist is None else min(d, max_dist + 1)


def damerau_levenshtein(a: str | bytes, b: str | bytes,
                        max_dist: int | None = None) -> int:
    """True (unrestricted) Damerau–Levenshtein distance — the
    Lowrance–Wagner DP with the last-occurrence table, so a
    transposition costs 1 even when later edits touch the swapped pair
    (e.g. d("CA","ABC") = 2, where the restricted/OSA variant gives 3).
    This is the transposition semantics of ES ``fuzziness`` (Lucene
    counts adjacent swaps as one edit) and matches DuckDB's
    ``damerau_levenshtein`` exactly — verified property-test-vs-DuckDB —
    so the SQL oracle twin is exact. Over UTF-8 bytes when given
    ``str``s (DuckDB parity, same convention as :func:`levenshtein`).

    With ``max_dist`` set, returns ``max_dist + 1`` as soon as the
    distance provably exceeds it, computing only the Ukkonen band
    ``|i - j| <= max_dist`` — exact for any answer ≤ ``max_dist``
    because every DL edit (incl. a transposition, which consumes one
    char of each string) moves ``i - j`` by at most 1 at cost ≥ 1, so
    any state on a ≤ ``max_dist``-cost path lies inside the band and
    out-of-band cells (left as the ``inf`` sentinel) can never feed a
    surviving path. O(max_dist · max(len)) instead of O(len²) — the
    expansion-hot-path cap the levenshtein kernel already had."""
    if isinstance(a, str):
        a = a.encode("utf-8")
    if isinstance(b, str):
        b = b.encode("utf-8")
    la, lb = len(a), len(b)
    if max_dist is not None and abs(la - lb) > max_dist:
        return max_dist + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    inf = la + lb
    # d is (la+2) x (lb+2); row/col 0 hold the `inf` sentinel frame
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    da: dict[int, int] = {}  # byte -> last row in a where it occurred
    for i in range(1, la + 1):
        db = 0  # last column in b matching a[i-1] so far in this row
        ai = a[i - 1]
        j_lo = 1 if max_dist is None else max(1, i - max_dist)
        j_hi = lb if max_dist is None else min(lb, i + max_dist)
        for j in range(j_lo, j_hi + 1):
            bj = b[j - 1]
            i1 = da.get(bj, 0)
            j1 = db
            if ai == bj:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,            # substitute / match
                d[i + 1][j] + 1,           # insert
                d[i][j + 1] + 1,           # delete
                d[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),  # transpose
            )
        da[ai] = i
    out = d[la + 1][lb + 1]
    return out if max_dist is None else min(out, max_dist + 1)


def similarity_ratio(a: str, b: str) -> float:
    """Normalized edit similarity 1 - dist/max(len) over UTF-8 bytes
    (the rapidfuzz ``ratio``-style score the reference's fuzzy tier
    thresholds on)."""
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    m = max(len(ab), len(bb))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(ab, bb) / m


def ratio100(a: str, b: str) -> float:
    """100·(1 − lev/max(len)) over UTF-8 BYTES on both factors — the
    SQL-checkable normalization of the rapidfuzz ``ratio`` (DuckDB
    ``levenshtein``/``strlen`` parity; rapidfuzz's own ratio uses indel
    distance, which SQL lacks — the deviation is documented here and in
    the oracle). Byte length must match the byte-level distance: the
    earlier char-length mix made multibyte pairs score below 0
    (ratio100('ёё','ab') was −100 — code-review r05 finding)."""
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    m = max(len(ab), len(bb), 1)
    return 100.0 * (1.0 - levenshtein(ab, bb) / m)


def token_sort_ratio(a: str, b: str) -> float:
    """rapidfuzz ``token_sort_ratio``: ratio over the space-joined
    SORTED token multisets — word-order-invariant matching
    (reference escalation: fuzzy_search_service.py:38-63)."""
    sa = " ".join(sorted(a.split()))
    sb = " ".join(sorted(b.split()))
    return ratio100(sa, sb)


def token_set_ratio(a: str, b: str) -> float:
    """rapidfuzz ``token_set_ratio``: with t0 = sorted intersection,
    t1 = t0 + sorted(a−b), t2 = t0 + sorted(b−a), the max of the three
    pairwise ratios — subset queries score ~100 against supersets."""
    ta, tb = set(a.split()), set(b.split())
    t0 = " ".join(sorted(ta & tb))
    t1 = " ".join(sorted(ta & tb) + sorted(ta - tb)).strip()
    t2 = " ".join(sorted(ta & tb) + sorted(tb - ta)).strip()
    return max(ratio100(t0, t1), ratio100(t0, t2), ratio100(t1, t2))


def partial_ratio(a: str, b: str) -> float:
    """rapidfuzz ``partial_ratio`` (word-boundary form): the best ratio
    of the SHORTER string against every same-token-count window of the
    longer — substring matches score ~100. Window set is word-aligned
    (not every char offset), keeping the kernel O(words); used by the
    Python escalation path and pytest-verified (not in the SQL twin)."""
    if len(a.split()) > len(b.split()):
        a, b = b, a
    wa, wb = a.split(), b.split()
    if not wa:
        return 100.0 if not wb else 0.0
    best = 0.0
    for i in range(len(wb) - len(wa) + 1):
        best = max(best, ratio100(a, " ".join(wb[i: i + len(wa)])))
    return best


#: the reference's per-algorithm escalation weights
#: (fuzzy_search_service.py:38-63 shape; values are this engine's
#: documented contract, shared verbatim with the SQL twin)
RATIO_WEIGHTS = (0.4, 0.35, 0.25)  # (ratio, token_sort, token_set)


def weighted_ratio(a: str, b: str) -> float:
    """The escalation combination: w1·ratio + w2·token_sort +
    w3·token_set with :data:`RATIO_WEIGHTS` (left-to-right sum — the
    FP-order contract the SQL twin replicates)."""
    w1, w2, w3 = RATIO_WEIGHTS
    return w1 * ratio100(a, b) + w2 * token_sort_ratio(a, b) \
        + w3 * token_set_ratio(a, b)


class FuzzyExpander:
    """Actor-pool callable: vocabulary batch → (q_term, term, dist)
    candidate rows for every query term within ``max_dist`` edits.

    Query terms are tiny and passed by value once per actor
    (``__init__``); the vocabulary streams through in batches. A
    byte-length window (|len(v)| - len(q)| ≤ max_dist) prunes the
    quadratic pair loop — safe because edit distance ≥ length
    difference — and the banded kernel exits early on hopeless pairs.
    At larger vocabularies the same stage would sit behind a char-3-gram
    prefilter over the vocabulary (the char3 index machinery), which
    this module's byte-window stands in for at test scale.
    """

    def __init__(self, query_terms: list[str], max_dist: int = 2,
                 prefix_len: int = 0, metric: str = "levenshtein"):
        self.q = [(t, t.encode("utf-8")) for t in query_terms]
        self.max_dist = max_dist
        # ES fuzzy prefix_length: the first N characters must match
        # EXACTLY — the standard expansion-cost / precision dial (typos
        # rarely hit the word onset); also the dictionary-scan pruner.
        self.prefix_len = int(prefix_len)
        # "damerau" = ES/Lucene default (transpositions cost 1 edit);
        # the byte-length window prune below stays valid: every DL edit
        # changes length by at most 1, so dist >= |len(a) - len(b)|.
        if metric not in ("levenshtein", "damerau"):
            raise ValueError(f"unknown fuzzy metric: {metric!r}")
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        out_q: list[str] = []
        out_t: list[str] = []
        out_d: list[int] = []
        md = self.max_dist
        pl = self.prefix_len
        for term in terms:
            tb = term.encode("utf-8")
            for qt, qb in self.q:
                if abs(len(tb) - len(qb)) > md:
                    continue
                if pl and term[:pl] != qt[:pl]:
                    continue
                if self.metric == "damerau":
                    d = damerau_levenshtein(qb, tb, max_dist=md)
                else:
                    d = levenshtein(qb, tb, max_dist=md)
                if d <= md:
                    out_q.append(qt)
                    out_t.append(term)
                    out_d.append(d)
        return pa.table(
            {
                "q_term": pa.array(out_q, pa.string()),
                "term": pa.array(out_t, pa.string()),
                "dist": pa.array(out_d, pa.int32()),
            }
        )


def fuzzy_expand(vocab_ds, query_terms: list[str], max_dist: int = 2, topn: int = 5,
                 prefix_len: int = 0, metric: str = "levenshtein"):
    """Vocabulary Dataset (term[, df]) → per-query-term expansion table
    (q_term, rnk, term, dist), ranked (dist asc, term asc), top ``topn``.
    The vocabulary never leaves the cluster; only ≤ |q|·topn rows come
    back."""

    def topn_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", "term"], kind="mergesort").head(topn)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["q_term", "rnk", "term", "dist"]]

    cand = vocab_ds.map_batches(
        FuzzyExpander,
        fn_constructor_args=(query_terms, max_dist, prefix_len, metric),
        batch_format="pyarrow",
        concurrency=2,
    )
    return cand.groupby("q_term").map_groups(topn_group, batch_format="pandas")


class _SuggestExpander:
    """Like :class:`FuzzyExpander` but keeps the vocabulary's df so the
    ranking can prefer common words (the ES term-suggester signal)."""

    def __init__(self, query_terms: list[str], max_dist: int):
        self.q = [(t, t.encode("utf-8")) for t in query_terms]
        self.max_dist = max_dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        dfs = batch["df"].to_pylist()
        out_q: list[str] = []
        out_t: list[str] = []
        out_d: list[int] = []
        out_f: list[int] = []
        md = self.max_dist
        for term, df in zip(terms, dfs):
            tb = term.encode("utf-8")
            for qt, qb in self.q:
                if abs(len(tb) - len(qb)) > md:
                    continue
                d = levenshtein(qb, tb, max_dist=md)
                if d <= md:
                    out_q.append(qt)
                    out_t.append(term)
                    out_d.append(d)
                    out_f.append(int(df))
        return pa.table(
            {
                "q_term": pa.array(out_q, pa.string()),
                "term": pa.array(out_t, pa.string()),
                "dist": pa.array(out_d, pa.int32()),
                "df": pa.array(out_f, pa.int64()),
            }
        )


def did_you_mean(vocab_ds, query_terms: list[str], max_dist: int = 2):
    """ES term-suggester ("did you mean"): per query term, the single
    best correction from the vocabulary Dataset (term, df), ranked by
    (edit distance asc, df DESC, term asc) — closest first, then the
    more common word, then a deterministic lexicographic tie-break.
    Terms with no candidate within ``max_dist`` produce no row. The
    vocabulary streams through the expander actors; only one row per
    query term returns."""

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", "df", "term"], ascending=[True, False, True],
                          kind="mergesort").head(1)
        return g[["q_term", "term", "dist", "df"]].rename(columns={"term": "suggestion"})

    cand = vocab_ds.map_batches(
        _SuggestExpander,
        fn_constructor_args=(query_terms, max_dist),
        batch_format="pyarrow",
        concurrency=2,
    )
    return cand.groupby("q_term").map_groups(best, batch_format="pandas")


class _CompletionExpander:
    """ES completion suggester candidate scan: a vocabulary term matches
    a suggest prefix when the edit distance between the prefix and the
    TERM'S OWN PREFIX of the same character length is ≤ ``fuzziness``
    (ES fuzzy completion semantics: typos in the typed prefix, not in
    the tail). Distance over UTF-8 bytes — DuckDB ``levenshtein(pre,
    substr(term,1,len(pre)))`` parity; slicing is by CODEPOINTS on both
    sides (Python str slice / SQL substr)."""

    def __init__(self, prefixes: dict[str, str], fuzziness: int):
        self.p = [(qid, pre, len(pre)) for qid, pre in sorted(prefixes.items())]
        self.fz = int(fuzziness)

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        dfs = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q: list[str] = []
        out_t: list[str] = []
        out_d: list[int] = []
        out_w: list[int] = []
        for term, w in zip(terms, dfs):
            for qid, pre, lp in self.p:
                d = levenshtein(pre, term[:lp], max_dist=self.fz)
                if d <= self.fz:
                    out_q.append(qid)
                    out_t.append(term)
                    out_d.append(d)
                    out_w.append(int(w))
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            "term": pa.array(out_t, pa.string()),
            "dist": pa.array(out_d, pa.int32()),
            "weight": pa.array(out_w, pa.int64()),
        })


def completion_suggest(vocab_ds, prefixes: dict[str, str], size: int = 5,
                       fuzziness: int = 1):
    """ES completion suggester with fuzzy prefix support: per suggest
    prefix, the top-``size`` vocabulary completions ranked (edit
    distance asc — exact-prefix hits first, the ES fuzzy-completion
    order — then weight desc, term asc), weight = document frequency.
    One distributed scan over the vocabulary Dataset; only
    ≤ |prefixes|·size rows return. Returns a Dataset of
    (query_id, rank, term, dist, weight)."""

    def topn_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", "weight", "term"],
                          ascending=[True, False, True], kind="mergesort").head(size)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "rank", "term", "dist", "weight"]]

    cand = vocab_ds.map_batches(
        _CompletionExpander,
        fn_constructor_args=(prefixes, fuzziness),
        batch_format="pyarrow",
        concurrency=2,
    )
    return cand.groupby("query_id").map_groups(topn_group, batch_format="pandas")


def suggest_popular(vocab_ds, query_terms: list[str], max_dist: int = 2):
    """ES term suggester with ``suggest_mode=popular``: a correction is
    offered ONLY when it is MORE FREQUENT than the input term itself
    (df_candidate > df_input; an absent input has df 0) — the mode that
    never "corrects" a common word into a rarer one. Same vocabulary
    scan as :func:`did_you_mean`; the input term's own df is discovered
    inside its candidate group (its dist-0 row), so no extra pass.
    Ranked (dist asc, df desc, term asc), one row per input with any
    qualifying candidate."""

    def best(g: pd.DataFrame) -> pd.DataFrame:
        qt = g["q_term"].iloc[0]
        own = g.loc[g["term"] == qt, "df"]
        own_df = int(own.iloc[0]) if len(own) else 0
        g = g[(g["term"] != qt) & (g["df"] > own_df)]
        if g.empty:
            return pd.DataFrame({"q_term": pd.Series([], dtype=object),
                                 "suggestion": pd.Series([], dtype=object),
                                 "dist": pd.Series([], dtype=np.int32),
                                 "df": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["dist", "df", "term"], ascending=[True, False, True],
                          kind="mergesort").head(1)
        return g[["q_term", "term", "dist", "df"]].rename(columns={"term": "suggestion"})

    cand = vocab_ds.map_batches(
        _SuggestExpander,
        fn_constructor_args=(query_terms, max_dist),
        batch_format="pyarrow",
        concurrency=2,
    )
    return cand.groupby("q_term").map_groups(best, batch_format="pandas")


def jaro_similarity(a: str | bytes, b: str | bytes) -> float:
    """Textbook Jaro similarity (Jaro 1989) — DuckDB
    ``jaro_similarity`` parity (property-tested): match window
    ``max(|a|,|b|)//2 − 1``, transpositions counted over matched
    sequences, ``(m/|a| + m/|b| + (m−t)/m) / 3``. DuckDB operates on
    UTF-8 BYTES (hypothesis-caught: two distinct codepoints sharing a
    lead byte score 2/3, not 0), so strings are encoded first — for
    single-script inputs byte and codepoint Jaro coincide."""
    if isinstance(a, str):
        a = a.encode("utf-8")
    if isinstance(b, str):
        b = b.encode("utf-8")
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and b[j] == ca:
                a_match[i] = True
                b_match[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str | bytes, b: str | bytes,
                 prefix_weight: float = 0.1) -> float:
    """Jaro–Winkler (Winkler 1990): Jaro boosted by the shared prefix
    (≤ 4 BYTES, the DuckDB convention) — the name-matching standard the
    reference's domain (sanctioned-entity screening) leans on; DuckDB
    ``jaro_winkler_similarity`` parity (property-tested)."""
    if isinstance(a, str):
        a = a.encode("utf-8")
    if isinstance(b, str):
        b = b.encode("utf-8")
    j = jaro_similarity(a, b)
    if j <= 0.7:           # Winkler boost threshold (DuckDB parity)
        return j
    l = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        l += 1
    return j + l * prefix_weight * (1.0 - j)
