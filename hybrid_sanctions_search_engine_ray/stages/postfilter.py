"""Result post-filters and boosts — applied AFTER retrieval/fusion.

The Ray-Data re-expression of the reference's post-processing block
(reference: src/ai_service/layers/search/hybrid_search_service.py:
1206-1262 — score threshold, entity-type / metadata filters, per-tier
boosts applied to fused candidates before the final cut — SURVEY.md
§2.6 T3/T4): everything here operates on TOP-K-SIZED frames (the
candidates of a query batch), never the corpus, so it is a vectorized
pandas/numpy finisher usable driver-side or inside a per-query
``map_groups``.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np
import pandas as pd

from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away


def rank_filter_boost(
    results: pd.DataFrame,
    meta: pd.DataFrame | None = None,
    min_score: float = 0.0,
    allowed_values: set | None = None,
    meta_col: str = "role",
    boosts: Mapping | None = None,
    top_k: int = 10,
    round_digits: int = 4,
) -> pd.DataFrame:
    """Filter + boost + re-rank candidate rows, fully vectorized.

    * ``results``: (query_id, rank, doc_id, score) — a search output.
    * ``meta``: optional (doc_id, <meta_col>) lookup (e.g. roles fetched
      via a row-group-pruned docmap/transcript read); joined broadcast-
      style (candidates are top-k-sized).
    * rows drop when score < ``min_score`` or their ``meta_col`` value
      is outside ``allowed_values``.
    * ``boosts`` maps meta values → multiplier; the boosted score is
      rounded to ``round_digits`` and results re-rank per query by
      (boosted desc, doc_id asc), truncated to ``top_k``.
    """
    out = results.copy()
    if meta is not None:
        # meta is authoritative: a results frame already carrying the
        # column (e.g. a chained call) would suffix the merge to _x/_y
        # and silently skip BOTH the filter and the boosts
        # (code-review r05 finding)
        if meta_col in out.columns:
            out = out.drop(columns=[meta_col])
        # one meta row per doc: duplicate doc_ids would fan candidate
        # rows out through the left merge, double-counting docs and
        # eating top-k slots (code-review r05 finding)
        meta = meta.drop_duplicates(subset=["doc_id"], keep="first")
        out = out.merge(meta, on="doc_id", how="left")
    mask = out["score"].to_numpy() >= min_score
    if allowed_values is not None and meta_col in out.columns:
        mask &= out[meta_col].isin(allowed_values).to_numpy()
    out = out.loc[mask]

    mult = np.ones(len(out), dtype=np.float64)
    if boosts and meta_col in out.columns:
        for val, b in boosts.items():
            mult[(out[meta_col] == val).to_numpy()] = float(b)
    out = out.assign(
        boosted_score=round_half_away(out["score"].to_numpy() * mult, round_digits)
    )

    out = out.sort_values(
        ["query_id", "boosted_score", "doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    out = out.groupby("query_id", sort=False).head(top_k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id", sort=False).cumcount().to_numpy(dtype=np.int32) + 1
    out["rank"] = out["rank"].astype(np.int32)
    cols = ["query_id", "rank", "doc_id"]
    if meta_col in out.columns:
        cols.append(meta_col)
    cols.append("boosted_score")
    return out[cols]
