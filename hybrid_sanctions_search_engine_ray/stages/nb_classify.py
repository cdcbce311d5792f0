"""Distributed multinomial Naive Bayes text classifier.

The classic count-based text classifier (the ancestor of the
fastText-style quality/language classifiers used to curate LLM training
corpora — e.g. the CommonCrawl "looks like Wikipedia" filters of
GPT-3/CCNet lineage): hashed-unigram features, per-class token counts
with add-one smoothing, argmax of log prior + Σ log p(bucket | class).

Everything here is COUNT-based, so training is exactly one
``groupby((class, bucket)).sum()`` over per-batch ``np.bincount``
partials — the same B-sized-shuffle shape as DSIR (stages/dsir.py), and
the bucket hash is the same DuckDB-parity ``md5_number_upper % B``
contract, so the whole operator is SQL-twinnable.

Float determinism: the per-(class, bucket) log-probability table is
rounded half-away to 4 decimals and stored as **int64 × 10⁴**. Per-doc
scores are integer sums of table entries — bit-exact under any batch /
sum order on both the Ray and SQL sides, so the argmax (ties broken by
ascending class label) is deterministic with NO float comparison
anywhere. This is the repo's "exact-cents" pattern applied to log-space.

Scale shape (two streaming passes, both 100-TB-safe):
1. train pass over the train split: per-batch bincounts per class →
   ONE (C × B)-row groupby (class-count sentinel rows ride along at
   bucket −1); C·B ≤ a few hundred k rows regardless of corpus size.
2. score pass over the test split: the (C × B) int64 log-prob matrix is
   broadcast once via ``ray.put``; each batch scores docs with one
   ``np.add.reduceat`` per class and emits (doc_id, true, pred, score).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms
from hybrid_sanctions_search_engine_ray.stages.dsir import _buckets
from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away


def _lp_int(num: np.ndarray, den: np.ndarray | float) -> np.ndarray:
    """round4(ln(num/den)) × 10⁴ as int64 (DuckDB round() parity)."""
    return round_half_away(np.log(num / den) * 1e4, 0).astype(np.int64)


def nb_train_score(ds, label_col: str, is_test_col: str,
                   n_buckets: int = 4096,
                   cfg: AnalyzerConfig | None = None) -> "ray.data.Dataset":
    """Train NB on the ``NOT is_test`` split, score the ``is_test`` split.

    ``ds`` carries (doc_id, text, ``label_col``, ``is_test_col`` bool).
    Returns a Dataset of (doc_id, true_label, pred_label, score_x1e4):
    one row per test doc, ``pred_label`` the argmax class (ties →
    ascending label), ``score_x1e4`` the winning integer score
    (log prior + Σ log-likelihood, ×10⁴). Classes = labels present in
    the TRAIN split; train docs define priors by doc count.
    """
    import ray
    from ray.data.aggregate import Sum

    cfg = cfg or AnalyzerConfig()

    def count_partial(b: pa.Table) -> pa.Table:
        keep = ~b[is_test_col].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(keep))
        labs_out, bks_out, cs_out = [], [], []
        if b.num_rows:
            labels = np.asarray(b[label_col].to_pylist(), dtype=object)
            if any(l is None for l in labels):
                # np.unique over object-with-None raises an opaque
                # TypeError deep in the worker (code-review r05) —
                # refuse with a clear validation error instead
                raise ValueError(
                    "nb train split contains null labels — drop or "
                    "impute them before training")
            parent, terms = flat_terms(b, cfg)
            bk = _buckets(terms, n_buckets) if parent.size else np.empty(0, np.int64)
            tok_lab = labels[parent] if parent.size else np.empty(0, object)
            for lab in np.unique(labels):
                m = tok_lab == lab
                c = np.bincount(bk[m], minlength=n_buckets).astype(np.int64)
                nz = np.flatnonzero(c)
                labs_out.append(np.repeat(lab, nz.size + 1))
                # sentinel bucket −1 carries the class's train DOC count
                bks_out.append(np.r_[np.int64(-1), nz])
                cs_out.append(np.r_[np.int64((labels == lab).sum()), c[nz]])
        return pa.table({
            "cls": pa.array(np.concatenate(labs_out) if labs_out else [], pa.string()),
            "b": pa.array(np.concatenate(bks_out) if bks_out else [], pa.int64()),
            "c_p": pa.array(np.concatenate(cs_out) if cs_out else [], pa.int64()),
        })

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["cls", "b"])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
    )
    if counts.empty:
        raise ValueError("nb_train_score: empty train split")
    classes = np.array(sorted(counts["cls"].unique()))
    c_idx = {c: i for i, c in enumerate(classes)}
    C = classes.size
    cnt = np.zeros((C, n_buckets), dtype=np.int64)
    nd = np.zeros(C, dtype=np.int64)
    tok_rows = counts[counts["b"] >= 0]
    cnt[tok_rows["cls"].map(c_idx).to_numpy(), tok_rows["b"].to_numpy()] = \
        tok_rows["c"].to_numpy()
    doc_rows = counts[counts["b"] == -1]
    nd[doc_rows["cls"].map(c_idx).to_numpy()] = doc_rows["c"].to_numpy()
    n_train = int(nd.sum())
    tot = cnt.sum(axis=1)
    # int64 ×10⁴ log-prob tables — the exactness contract.
    lp = _lp_int(cnt + 1.0, (tot + float(n_buckets))[:, None])
    prior = _lp_int(nd.astype(float), float(n_train))
    model_ref = ray.put((classes, lp, prior))

    def score_partial(b: pa.Table) -> pa.Table:
        cls_arr, lpv, pri = ray.get(model_ref)
        keep = b[is_test_col].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(keep))
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "true_label": pa.array([], pa.string()),
                             "pred_label": pa.array([], pa.string()),
                             "score_x1e4": pa.array([], pa.int64())})
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        scores = np.tile(pri[:, None], (1, b.num_rows))  # C × n_docs
        parent, terms = flat_terms(b, cfg)
        if parent.size:
            bk = _buckets(terms, n_buckets)
            starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
            docs_at = parent[starts]
            for ci in range(cls_arr.size):
                sums = np.add.reduceat(lpv[ci, bk], starts)
                scores[ci, docs_at] += sums
        best = np.argmax(scores, axis=0)  # first max = ascending label tie-break
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "true_label": b[label_col],
            "pred_label": pa.array(cls_arr[best]),
            "score_x1e4": pa.array(scores[best, np.arange(b.num_rows)]),
        })

    return ds.map_batches(score_partial, batch_format="pyarrow")
