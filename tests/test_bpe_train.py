"""BPE merge training (stages/bpe_train.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from hybrid_sanctions_search_engine_ray.stages.bpe_train import bpe_train


def _ds(texts):
    return rd.from_arrow(pa.table({"text": pa.array(texts)}))


def test_bpe_learns_hand_checked_merges(ray_session):
    # corpus: "low" x5, "lower" x2, "newest" x6  (Sennrich's example shape)
    texts = ["low " * 5, "lower " * 2, "newest " * 6]
    out = bpe_train(_ds(texts), "text", n_merges=3)
    # round 1: 'newest' contributes w-e ×6 (n-e-W-E-s-t) and 'lower'
    # w-e ×2 → (w,e)=8 is the global max
    assert out.iloc[0][["left", "right"]].tolist() == ["w", "e"]
    assert out.iloc[0]["pair_count"] == 8
    # second round: l-o / o-w now 7 each... o-w vs l-o tie at 7 → lexicographic: ('l','o')
    assert out.iloc[1][["left", "right"]].tolist() == ["l", "o"]
    assert out.iloc[1]["pair_count"] == 7
    assert len(out) == 3 and out["merge_rank"].tolist() == [1, 2, 3]
    # round 3: count-6 tie among newest's pairs breaks lexicographically
    assert out.iloc[2]["pair_count"] == 6


def test_bpe_stops_when_dry(ray_session):
    out = bpe_train(_ds(["a b c"]), "text", n_merges=10)
    # every word is a single char + </w>; each pair occurs once → no merge ≥ 2
    assert len(out) == 0
    empty = bpe_train(_ds([""]), "text", n_merges=3)
    assert empty.empty
