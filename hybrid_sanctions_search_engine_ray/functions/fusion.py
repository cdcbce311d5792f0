"""Result-set fusion: weighted union of two ranked candidate lists.

Reference parity (reference: src/ai_service/layers/search/
hybrid_search_service.py:1114-1204 ``_fuse_results``; weights from
config/weights.json:41-50 — SURVEY.md §2.7 D3): normalize each list's
scores to [0,1] by its max, combine with normalized weights, add a
``shared_bonus`` when a doc appears in both lists and a flat
``metadata_bonus`` hook, dedup by doc keeping the fused score, sort
(score desc, doc_id asc), truncate. Also provides reciprocal-rank
fusion (RRF, Cormack et al. '09 — documented as the alternative in the
reference's docs/DATA_PIPELINE.md:855-886).

Pure-numpy functions over (doc_id, score) arrays — usable driver-side
on top-k outputs or inside a ``map_groups`` per query.
"""

from __future__ import annotations

import numpy as np

DEFAULT_W_A = 0.65   # reference: AC/lexical weight
DEFAULT_W_B = 0.35   # reference: vector/semantic weight
DEFAULT_SHARED_BONUS = 0.15
DEFAULT_METADATA_BONUS = 0.05


def weighted_fusion(
    docs_a: np.ndarray,
    scores_a: np.ndarray,
    docs_b: np.ndarray,
    scores_b: np.ndarray,
    w_a: float = DEFAULT_W_A,
    w_b: float = DEFAULT_W_B,
    shared_bonus: float = DEFAULT_SHARED_BONUS,
    metadata_bonus_docs: np.ndarray | None = None,
    metadata_bonus: float = DEFAULT_METADATA_BONUS,
    top_k: int = 50,
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse two ranked lists → (doc_ids, fused_scores), max-normalized
    weighted sum + shared-hit bonus, ties (score desc, doc_id asc)."""
    wsum = w_a + w_b
    w_a, w_b = w_a / wsum, w_b / wsum
    # guard max<=0: an all-zero list would divide 0/0 into NaN and sink
    # every real-scored shared doc below unshared ones (code-review r05;
    # weighted_fusion_many already guards this)
    na = scores_a / scores_a.max() if scores_a.size and scores_a.max() > 0 \
        else np.zeros_like(scores_a)
    nb = scores_b / scores_b.max() if scores_b.size and scores_b.max() > 0 \
        else np.zeros_like(scores_b)

    all_docs = np.concatenate([docs_a, docs_b]).astype(np.int64)
    contrib = np.concatenate([na * w_a, nb * w_b])
    uniq, inv = np.unique(all_docs, return_inverse=True)
    fused = np.bincount(inv, weights=contrib, minlength=uniq.size)
    in_a = np.isin(uniq, docs_a.astype(np.int64))
    in_b = np.isin(uniq, docs_b.astype(np.int64))
    fused[in_a & in_b] += shared_bonus
    if metadata_bonus_docs is not None and metadata_bonus_docs.size:
        fused[np.isin(uniq, metadata_bonus_docs.astype(np.int64))] += metadata_bonus

    k = min(top_k, uniq.size)
    order = np.lexsort((uniq, -fused))[:k]
    return uniq[order], fused[order]


def rrf_fusion(
    ranked_lists: list[np.ndarray],
    k: int = 60,
    top_k: int = 50,
) -> tuple[np.ndarray, np.ndarray]:
    """Reciprocal-rank fusion: score(d) = Σ_lists 1/(k + rank_d)."""
    if not ranked_lists:
        # no candidate tiers: empty fusion, not an opaque numpy error
        # (code-review r05; mirrors weighted_fusion_many)
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    all_docs = np.concatenate([r.astype(np.int64) for r in ranked_lists])
    all_scores = np.concatenate(
        [1.0 / (k + np.arange(1, r.size + 1)) for r in ranked_lists]
    )
    uniq, inv = np.unique(all_docs, return_inverse=True)
    fused = np.bincount(inv, weights=all_scores, minlength=uniq.size)
    kk = min(top_k, uniq.size)
    order = np.lexsort((uniq, -fused))[:kk]
    return uniq[order], fused[order]


def weighted_fusion_many(
    lists: list[tuple[np.ndarray, np.ndarray]],
    weights: list[float],
    top_k: int = 50,
) -> tuple[np.ndarray, np.ndarray]:
    """N-way max-normalized weighted fusion (the 2-way
    :func:`weighted_fusion` generalized to the reference's full tier
    set: lexical + fuzzy + vector): each ranked list is normalized by
    its own max score, weighted, and summed per doc; ties
    (score desc, doc_id asc). No shared-hit bonus — with 3+ signals the
    weighted overlap itself is the agreement evidence."""
    if len(lists) != len(weights) or not lists:
        raise ValueError("need one weight per ranked list")
    wsum = float(sum(weights))
    parts_d: list[np.ndarray] = []
    parts_c: list[np.ndarray] = []
    for (docs, scores), w in zip(lists, weights):
        docs = np.asarray(docs, dtype=np.int64)
        scores = np.asarray(scores, dtype=np.float64)
        if docs.size == 0:
            continue
        parts_d.append(docs)
        parts_c.append((scores / scores.max() if scores.max() > 0 else scores) * (w / wsum))
    if not parts_d:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    all_docs = np.concatenate(parts_d)
    contrib = np.concatenate(parts_c)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    fused = np.bincount(inv, weights=contrib, minlength=uniq.size)
    k = min(top_k, uniq.size)
    order = np.lexsort((uniq, -fused))[:k]
    return uniq[order], fused[order]
