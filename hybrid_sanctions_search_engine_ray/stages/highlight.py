"""Search-result highlighting: snippet extraction + matched-term marks.

The Ray-Data re-expression of the reference's ES highlighting request
(reference: src/ai_service/layers/search/elasticsearch_adapters.py:
326-351 — ``search_body["highlight"]`` plus the ``hit["highlight"]``
keys folded into ``match_fields``; opt-in via
``SearchOpts.enable_highlighting``, contracts.py:92). ES delegates to
Lucene's highlighter; here the semantics are defined explicitly so a
SQL oracle can replay them exactly:

* matching is SUBSTRING matching over ``lower(text)`` (the plain
  unified-highlighter shape, not positional re-analysis);
* ``first_pos`` is the 1-based character position of the earliest
  occurrence of any query term;
* the snippet is the ``length``-char window of the lowered text
  starting ``window`` chars before ``first_pos``, clamped to the text
  start;
* matched terms inside the snippet are wrapped ``<em>…</em>`` via ONE
  leftmost-first alternation ordered (len desc, term asc) — identical
  match choice in Python ``re`` and DuckDB/RE2;
* ``match_terms`` lists the matching terms, sorted, comma-joined
  (the ``match_fields`` analogue).

Two entry points: ``highlight_corpus`` maps the kernel over a corpus
Dataset (used by the oracle gate); ``highlight_results`` decorates a
top-k search frame from an index built with ``store_text=True`` using
row-group-pruned docmap reads — the real serving path, which never
touches more rows than the candidate set.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads


def _alternation(terms: list[str]) -> str:
    """One capture-group alternation, longest-first then lexicographic —
    leftmost-first engines (Python re, RE2) then agree on every match."""
    ordered = sorted(set(terms), key=lambda t: (-len(t), t))
    return "(" + "|".join(re.escape(t) for t in ordered) + ")"


def highlight_frame(
    df: pd.DataFrame,
    terms: list[str],
    text_col: str = "text",
    window: int = 30,
    length: int = 80,
    keep_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Vectorized highlight kernel over one pandas frame.

    Returns only rows with >= 1 matching term, with columns
    ``keep_cols + [first_pos, match_terms, snippet]``.
    """
    terms = sorted({t for t in terms if t})
    keep_cols = keep_cols if keep_cols is not None else ["doc_id"]
    empty = pd.DataFrame(
        {
            **{c: df[c].iloc[:0] for c in keep_cols},
            "first_pos": pd.Series([], dtype=np.int64),
            "match_terms": pd.Series([], dtype=object),
            "snippet": pd.Series([], dtype=object),
        }
    )
    if not terms or df.empty:
        return empty

    low = df[text_col].astype(str).str.lower()
    pos = np.full((len(terms), len(df)), -1, dtype=np.int64)
    for i, t in enumerate(terms):
        pos[i] = low.str.find(t).to_numpy(dtype=np.int64)
    hit = pos >= 0
    any_hit = hit.any(axis=0)
    if not any_hit.any():
        return empty

    low = low[any_hit]
    pos = pos[:, any_hit]
    hit = hit[:, any_hit]
    # 1-based char position of the earliest occurrence of any term
    first_pos = np.where(hit, pos, np.iinfo(np.int64).max).min(axis=0) + 1
    start = np.maximum(first_pos - window, 1)

    snip = pd.Series(
        [s[int(b) - 1 : int(b) - 1 + length] for s, b in zip(low, start)],
        index=low.index,
        dtype=object,
    )
    pat = _alternation(terms)
    snip = snip.str.replace(pat, r"<em>\1</em>", regex=True)

    term_arr = np.array(terms, dtype=object)
    match_terms = [",".join(term_arr[hit[:, j]]) for j in range(hit.shape[1])]
    out = df.loc[any_hit, keep_cols].copy()
    out["first_pos"] = first_pos
    out["match_terms"] = match_terms
    out["snippet"] = snip.to_numpy()
    return out


def highlight_corpus(
    ds,
    terms: list[str],
    text_col: str = "text",
    window: int = 30,
    length: int = 80,
    id_col: str = "doc_id",
):
    """Corpus Dataset → (id, first_pos, match_terms, snippet) for every
    document containing >= 1 term — one streaming ``map_batches`` sweep,
    non-matching rows dropped batch-side (output is match-sized)."""

    def _hl(batch: pd.DataFrame) -> pd.DataFrame:
        return highlight_frame(
            batch, terms, text_col=text_col, window=window, length=length,
            keep_cols=[id_col],
        )

    return ds.map_batches(_hl, batch_format="pandas")


def highlight_results(
    results: pd.DataFrame,
    index_dir: str,
    query_text: str,
    reader=None,
    window: int = 30,
    length: int = 80,
) -> pd.DataFrame:
    """Decorate a top-k search frame (query_id?, rank, doc_id, score)
    with (first_pos, match_terms, snippet) — the reference's
    ``enable_highlighting`` path. Texts come from the index docmap via a
    row-group-pruned point read (requires ``store_text=True`` at build
    time); rows whose doc has no term occurrence keep NaN/None marks, as
    ES leaves ``highlight`` absent for non-highlighted hits."""
    from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader

    r = reader or IndexReader(index_dir)
    terms = r.analyzer(query_text)
    if results.empty or not terms:
        return results.assign(first_pos=pd.NA, match_terms=pd.NA, snippet=pd.NA)
    ids = sorted({int(d) for d in results["doc_id"]})
    dm = pads.dataset(os.path.join(index_dir, "docmap.parquet")).to_table(
        filter=pads.field("doc_id").isin(ids)
    )
    if "text" not in dm.column_names:
        raise ValueError("highlight_results requires an index built with store_text=True")
    texts = dm.select(["doc_id", "text"]).to_pandas()
    marks = highlight_frame(texts, terms, window=window, length=length)
    return results.merge(marks, on="doc_id", how="left")


def highlight_sql_expr(
    terms: list[str], text_expr: str = "lower(text)", window: int = 30, length: int = 80
) -> dict[str, str]:
    """The DuckDB expressions that replay this module's semantics —
    kept HERE so the oracle and the kernel share one definition.

    Returns SQL snippets for ``first_pos``, ``match_terms``, ``snippet``
    and ``where`` (the >= 1-match filter) over ``text_expr``."""
    terms = sorted({t for t in terms if t})
    esc = [t.replace("'", "''") for t in terms]
    least = ", ".join(
        f"CASE WHEN strpos({text_expr}, '{t}') > 0 THEN strpos({text_expr}, '{t}') "
        f"ELSE NULL END" for t in esc
    )
    alts = "|".join(
        re.escape(t) for t in sorted(set(terms), key=lambda t: (-len(t), t))
    ).replace("'", "''")
    lst = ", ".join(f"'{t}'" for t in esc)
    return {
        "first_pos": f"least({least})::BIGINT",
        "match_terms": (
            f"array_to_string(list_sort([t for t in [{lst}] "
            f"if strpos({text_expr}, t) > 0]), ',')"
        ),
        "snippet": (
            f"regexp_replace(substring({text_expr}, "
            f"greatest(least({least})::BIGINT - {window}, 1), {length}), "
            f"'({alts})', '<em>\\1</em>', 'g')"
        ),
        "where": " OR ".join(f"strpos({text_expr}, '{t}') > 0" for t in esc),
    }
