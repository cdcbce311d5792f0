"""Char-n-gram TF-IDF cosine ranking — the reference's local fallback
vector index, Ray-Data-first.

Reference parity: ``CharTfidfVectorIndex`` (reference:
src/ai_service/layers/embeddings/indexing/vector_index_service.py:29-66)
ranks by cosine over an sklearn ``TfidfVectorizer(analyzer="char",
sublinear_tf=True, norm="l2")`` matrix — weights ``(1 + ln tf) · idf``
with smooth idf ``ln((1+N)/(1+df)) + 1``, l2-normalized per document,
queries transformed with the FITTED idf (unseen grams dropped). This
module re-expresses those semantics over the engine's char-3-gram
tokenization (grams per simple-mode token, matching the existing
``char3`` field and its SQL oracle — unlike sklearn's ``analyzer="char"``
the grams never span whitespace), dropping the optional SVD/FAISS
compaction which is an approximation layer, not a semantic.

Scale shape — two streaming passes, ZERO corpus shuffles:

1. ``gram_df``: per-batch distinct (doc, gram) → per-batch partial df →
   tiny ``groupby(gram).sum``. The char-n-gram vocabulary is BOUNDED
   (≤ |alphabet|³, ~50k for latin+cyrillic+digits) regardless of corpus
   size, so the df table is broadcastable at any scale — the property
   that makes TF-IDF cheaper to distribute than BM25's per-term
   posting shuffle.
2. ``tfidf_topk``: broadcast (idf dict, query weights) via ``ray.put``;
   each batch computes its docs' full weight vectors, per-doc l2 norms
   (one ``np.bincount``), the dot against the query grams, and emits
   only its batch-local top-k; a final tiny merge ranks globally by
   (round(score, 4) desc, doc_id asc) — the engine's tie rule for
   float-scored tiers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from hybrid_sanctions_search_engine_ray.functions.analyzer import char3_grams, tokenize_simple
from hybrid_sanctions_search_engine_ray.stages.analyze import _char3_occurrences
from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away


def char3_tf(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Batch → (doc_id, gram, tf) WITH multiplicities (the char3 index
    path keeps only distinct grams; tf-idf needs counts). Same vectorized
    slice sweeps as the char3 analyzer, counted by Arrow hash-group_by."""
    occ = _char3_occurrences(batch[text_col])
    if occ.num_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "gram": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    counted = occ.group_by(["d", "t"]).aggregate([([], "count_all")])
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            id_col: pa.array(ids[counted["d"].to_numpy(zero_copy_only=False)], pa.int64()),
            "gram": counted["t"],
            "tf": counted["count_all"],
        }
    )


def gram_df(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus Dataset → (gram, df) Dataset. Map-side partial (distinct
    docs per gram inside each batch — exact because batches hold whole
    documents) then one SMALL shuffle over the bounded gram vocabulary."""

    def partial(batch: pa.Table) -> pa.Table:
        occ = _char3_occurrences(batch[text_col])
        # the "" sentinel gram carries the batch's DOC count (grams are
        # always 3 chars, so "" cannot collide) — consumers that need N
        # read it off the same pass instead of a separate corpus scan
        # (code-review r05: tfidf_topk ran a third full plan execution
        # just for ds.count())
        sent = pa.table({"gram": pa.array([""], pa.string()),
                         "df_part": pa.array([batch.num_rows], pa.int64())})
        if occ.num_rows == 0:
            return sent
        dist = occ.group_by(["d", "t"]).aggregate([])
        agg = dist.group_by("t").aggregate([([], "count_all")])
        return pa.concat_tables([
            pa.table({"gram": agg["t"],
                      "df_part": agg["count_all"].cast(pa.int64())}), sent])

    return ds.map_batches(partial, batch_format="pyarrow").groupby("gram").sum("df_part")


def smooth_idf(df: np.ndarray, n_docs: int) -> np.ndarray:
    """sklearn's smooth idf: ln((1+N)/(1+df)) + 1."""
    return np.log((1.0 + n_docs) / (1.0 + df.astype(np.float64))) + 1.0


def query_weights(query_text: str, idf: dict[str, float]) -> dict[str, float]:
    """Transform a query exactly as sklearn's fitted vectorizer does:
    char3 grams WITH counts, sublinear tf, fitted idf, grams outside the
    corpus vocabulary dropped, l2-normalized."""
    tf: dict[str, int] = {}
    for tok in tokenize_simple(query_text):
        for g in char3_grams(tok):
            tf[g] = tf.get(g, 0) + 1
    w = {g: (1.0 + np.log(c)) * idf[g] for g, c in tf.items() if g in idf}
    norm = float(np.sqrt(sum(v * v for v in w.values())))
    if norm == 0.0:
        return {}
    return {g: v / norm for g, v in w.items()}


class _TfidfPartialTopK:
    """map_batches body: score every doc of the batch against the
    broadcast query vector, emit the batch-local top-k."""

    def __init__(self, ref, k: int, round_digits: int):
        b = ray.get(ref)
        self.idf: dict[str, float] = b["idf"]
        self.qw: dict[str, float] = b["qw"]
        self.k = k
        self.round_digits = round_digits

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if not self.qw:
            return empty
        tf = char3_tf(batch)
        if tf.num_rows == 0:
            return empty
        from hybrid_sanctions_search_engine_ray.functions.hashing import factorize_exact

        codes, uniq = factorize_exact(tf["gram"])
        u_idf = np.array([self.idf.get(g, 0.0) for g in uniq])
        u_qw = np.array([self.qw.get(g, 0.0) for g in uniq])
        w = (1.0 + np.log(tf["tf"].to_numpy(zero_copy_only=False).astype(np.float64))) * u_idf[codes]
        d = tf["doc_id"].to_numpy(zero_copy_only=False)
        dcodes, dids = pd.factorize(d)
        norm = np.sqrt(np.bincount(dcodes, weights=w * w, minlength=len(dids)))
        dot = np.bincount(dcodes, weights=w * u_qw[codes], minlength=len(dids))
        with np.errstate(invalid="ignore", divide="ignore"):
            score = np.where(norm > 0, dot / norm, 0.0)
        keep = np.flatnonzero(score > 0)
        if keep.size == 0:
            return empty
        # round BEFORE the local cut and keep 4k (the engine's tie-prone-
        # float-tier convention): the global merge then ranks the same
        # (rounded desc, doc_id asc) order the SQL oracle computes
        rounded = round_half_away(score[keep], self.round_digits)
        order = keep[np.lexsort((dids[keep], -rounded))][: 4 * self.k]
        return pa.table(
            {
                "doc_id": pa.array(dids[order].astype(np.int64)),
                "score": pa.array(score[order], pa.float64()),
            }
        )


def tfidf_topk(ds, query_text: str, k: int = 10, round_digits: int = 4,
               n_docs: int | None = None, concurrency: int = 2) -> pd.DataFrame:
    """Char-3-gram TF-IDF cosine top-k over a corpus Dataset.

    Pass 1 computes (gram, df) — bounded output — and N; the idf dict
    and the transformed query vector broadcast once; pass 2 streams the
    corpus, scoring batch-locally and emitting k rows per batch; the
    driver merges blocks×k rows. Final order: (round(score) desc,
    doc_id asc), ranks attached."""
    df_tbl = gram_df(ds).to_pandas()
    sent = df_tbl["gram"] == ""
    if n_docs is None:
        n_docs = int(df_tbl.loc[sent, "sum(df_part)"].sum())
    df_tbl = df_tbl[~sent]
    idf_arr = smooth_idf(df_tbl["sum(df_part)"].to_numpy(), n_docs)
    idf = dict(zip(df_tbl["gram"], idf_arr))
    qw = query_weights(query_text, idf)
    ref = ray.put({"idf": idf, "qw": qw})
    cand = ds.map_batches(
        _TfidfPartialTopK,
        fn_constructor_args=(ref, k, round_digits),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).to_pandas()
    if cand.empty:
        return pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    cand["score"] = round_half_away(cand["score"].to_numpy(), round_digits)
    cand = cand.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(k).reset_index(drop=True)
    cand.insert(0, "rank", np.arange(1, len(cand) + 1, dtype=np.int64))
    return cand


def word_doc_keywords(ds, cfg, df_map: dict[str, int], n_docs: int, k: int = 3):
    """Per-document keyword extraction: the top-``k`` word terms by
    tf·idf (BM25's Lucene idf, ties broken term-ascending) — the
    standard corpus-tagging step of an LLM-data pipeline.

    Scale shape: the (term → df) table rides the object store ONCE
    (``ray.put``) and every batch joins against it with one pandas hash
    merge; per-doc top-k is one lexsort + block cumcount. The broadcast
    is vocabulary-sized — fine for word vocabularies (≪ corpus);
    for unbounded token spaces, pre-prune the df table to terms above a
    df floor (rare terms are the keywords anyway, but a floor of 1 is
    the honest default) before broadcasting.
    Returns a Dataset of (doc_id, rank, term, score)."""
    from hybrid_sanctions_search_engine_ray.functions.bm25 import idf as bm25_idf
    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    terms_arr = np.array(sorted(df_map), dtype=object)
    idf_arr = bm25_idf(n_docs, np.array([df_map[t] for t in terms_arr], dtype=np.float64))
    ref = ray.put({"terms": terms_arr, "idf": idf_arr})

    class _Keywords:
        def __init__(self):
            d = ray.get(ref)
            self.terms, self.idf = d["terms"], d["idf"]

        def __call__(self, b: pa.Table) -> pd.DataFrame:
            parent, toks = flat_terms(b, cfg)
            empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                  "rank": pd.Series([], dtype=np.int32),
                                  "term": pd.Series([], dtype=object),
                                  "score": pd.Series([], dtype=np.float64)})
            if parent.size == 0:
                return empty
            tf_tbl = pa.table({"d": pa.array(parent, pa.int64()), "t": toks}).group_by(
                ["d", "t"]
            ).aggregate([([], "count_all")])
            rows = tf_tbl["d"].to_numpy(zero_copy_only=False)
            t_np = tf_tbl["t"].to_numpy(zero_copy_only=False)
            tf = tf_tbl["count_all"].to_numpy(zero_copy_only=False).astype(np.float64)
            if self.terms.size == 0:
                return empty  # empty df_map: no known vocabulary (r05)
            at = np.searchsorted(self.terms, t_np)
            at = np.minimum(at, self.terms.size - 1)
            known = self.terms[at] == t_np
            if not known.any():
                return empty
            rows, t_np, tf, at = rows[known], t_np[known], tf[known], at[known]
            score = tf * self.idf[at]
            ids = b["doc_id"].to_numpy(zero_copy_only=False)[rows]
            # lexicographic tie-break on the term via ordinal codes
            # (np.unique returns sorted uniques, so inverse codes order
            # exactly like the strings — ASCII == DuckDB binary collation)
            _, t_codes = np.unique(t_np, return_inverse=True)
            order = np.lexsort((t_codes, -score, ids))
            ids_s = ids[order]
            starts = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
            within = np.arange(ids_s.size) - np.repeat(
                starts, np.diff(np.r_[starts, ids_s.size])
            )
            keep = within < k
            sel = order[keep]
            return pd.DataFrame({"doc_id": ids[sel].astype(np.int64),
                                 "rank": (within[keep] + 1).astype(np.int32),
                                 "term": t_np[sel],
                                 "score": score[sel]})

    return ds.map_batches(_Keywords, batch_format="pyarrow", concurrency=2, batch_size=4096)
