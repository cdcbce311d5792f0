"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose HASHED n-gram
distribution looks like a target corpus.

The published recipe: featurize each document as a bag of hashed n-gram
buckets; fit two bucket-frequency models (target p, raw q) with add-one
smoothing; score every raw document by its log importance weight
``log w(x) = Σ_buckets count_b(x) · ln(p_b / q_b)``; resample the raw
corpus by those weights. This implementation uses hashed UNIGRAMS and
the deterministic top-N selection (the paper's Gumbel-noise variant is
a randomized tie-breaker on the same weights; determinism keeps the
operator retry/resume-stable and SQL-twinnable — the repo-wide rule).

Token-bucket hash: DuckDB ``md5_number_upper`` parity (little-endian
int of the md5 digest's first 8 bytes) mod ``n_buckets`` — the same
SQL-checkable convention as SimHash/MinHash (stages/dedup.py).

Scale shape (two streaming passes, both safe at 100 TB):
1. bucket-count pass: per-batch ``np.bincount`` partials over hashed
   tokens, two int64 vectors (target / raw) of length B per batch →
   ONE B-sized groupby — bucket rows move, never tokens.
2. scoring pass: the (B ≤ 64k)-entry log-ratio vector is broadcast via
   ``ray.put`` once; each batch scores its docs with one bincount-dot
   (``np.add.reduceat`` over parent runs) and emits a per-batch partial
   top-N — the driver merges ≤ n_blocks × N candidate rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.functions.hashing import factorize_exact
from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away
from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms


def _buckets(terms, n_buckets: int) -> np.ndarray:
    """md5_number_upper-parity bucket per token (factorized per batch)."""
    codes, uniques = factorize_exact(terms)
    uh = np.empty(len(uniques), dtype=np.uint64)
    for i, u in enumerate(uniques):
        b = u.encode("utf-8") if isinstance(u, str) else b""
        uh[i] = int.from_bytes(hashlib.md5(b).digest()[:8], "little")
    return (uh % np.uint64(n_buckets)).astype(np.int64)[codes]


def dsir_select(ds, is_target_col: str, n_select: int,
                n_buckets: int = 4096,
                cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Top-``n_select`` raw docs by DSIR log importance weight.

    ``ds`` must carry (doc_id, text, ``is_target_col`` bool). Returns
    (doc_id, logw round4) ordered by (logw desc, doc_id asc) — the
    deterministic resampling rank. Weights use add-one smoothing:
    ``lr_b = ln((ct_b+1)/(Nt+B)) − ln((cr_b+1)/(Nr+B))``.
    """
    import ray
    from ray.data.aggregate import Sum

    cfg = cfg or AnalyzerConfig()

    def count_partial(b: pa.Table) -> pa.Table:
        parent, terms = flat_terms(b, cfg)
        bk = _buckets(terms, n_buckets)
        is_t = b[is_target_col].to_numpy(zero_copy_only=False)[parent]
        ct = np.bincount(bk[is_t], minlength=n_buckets).astype(np.int64)
        cr = np.bincount(bk[~is_t], minlength=n_buckets).astype(np.int64)
        # emit only occupied buckets: the driver's scatter-fill already
        # tolerates absent rows, and shipping n_batches × n_buckets
        # zero rows dominates the shuffle for sparse batches
        # (code-review r05 finding; the nb_classify pattern)
        nz = np.flatnonzero(ct | cr)
        return pa.table({"b": pa.array(nz),
                         "ct_p": pa.array(ct[nz]), "cr_p": pa.array(cr[nz])})

    hist = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("ct_p", alias_name="ct"), Sum("cr_p", alias_name="cr"))
        .to_pandas()
        .sort_values("b", kind="mergesort")
    )
    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    ct[hist["b"].to_numpy()] = hist["ct"].to_numpy()
    cr[hist["b"].to_numpy()] = hist["cr"].to_numpy()
    nt, nr = int(ct.sum()), int(cr.sum())
    lr = (np.log((ct + 1.0) / (nt + n_buckets))
          - np.log((cr + 1.0) / (nr + n_buckets)))
    lr_ref = ray.put(lr)

    def score_partial(b: pa.Table) -> pa.Table:
        lrv = ray.get(lr_ref)
        keep = ~b[is_target_col].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(keep))
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "logw": pa.array([], pa.float64())})
        parent, terms = flat_terms(b, cfg)
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        logw = np.zeros(b.num_rows, dtype=np.float64)
        if parent.size:
            contrib = lrv[_buckets(terms, n_buckets)]
            starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
            sums = np.add.reduceat(contrib, starts)
            logw[parent[starts]] = sums
        w4 = round_half_away(logw, 4)
        top = np.lexsort((doc_ids, -w4))[:n_select]
        return pa.table({"doc_id": pa.array(doc_ids[top]),
                         "logw": pa.array(w4[top])})

    cand = ds.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "logw": pd.Series([], dtype=float)})
    cand = cand.sort_values(["logw", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(n_select).reset_index(drop=True)
    return pd.DataFrame({"doc_id": cand["doc_id"].astype(np.int64),
                         "logw": cand["logw"].astype(float)})
