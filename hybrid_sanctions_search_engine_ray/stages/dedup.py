"""Deduplication operators — the training-data-pipeline family:

* exact (content-hash partition + per-group min) — the scale pattern is
  hash column in ``map_batches`` then ``groupby(hash)``, never a global
  sort. Reference analog: id-keyed entity dedup (reference:
  src/ai_service/layers/search/sanctions_data_loader.py:219-275 —
  SURVEY.md §2.7 D4).
* MinHash + LSH banding (Broder '97 resemblance sketches; Leskovec/
  Rajaraman/Ullman MMDS ch.3): shingle → minhash → band →
  ``groupby(band_id, band_hash)`` → candidate pairs → exact-Jaccard
  verify. All-pairs work only happens inside LSH buckets.
* SimHash (Charikar '02): 64-bit hyperplane sketch from token hashes,
  hamming-bucketed.
* n-gram Jaccard verify for candidate pairs.

Everything is deterministic (crc32/md5-seeded permutations), so results
are stable across runs, processes and cluster sizes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

# --- exact dedup -----------------------------------------------------------


def add_md5(batch: pa.Table, col: str = "text") -> pa.Table:
    """md5 hex of the column (matches DuckDB ``md5(text)`` exactly)."""
    vals = batch[col].to_pylist()
    h = [hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals]
    return batch.append_column("text_md5", pa.array(h, pa.string()))


def exact_dedup_groups(ds):
    """Dataset with text → (text_md5, keep_doc_id, n_dups); scale shape:
    vectorized hash per batch, one hash-shuffle, per-group O(1) reduce."""
    from ray.data.aggregate import Count, Min

    return (
        ds.map_batches(add_md5, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dups"))
    )


# --- MinHash + LSH ---------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(tokens: np.ndarray, k: int) -> np.ndarray:
    """crc32-based hashes of word k-shingles (unique)."""
    import zlib

    if tokens.size < k:
        joined = [" ".join(tokens.tolist())] if tokens.size else []
    else:
        joined = [" ".join(tokens[i : i + k].tolist()) for i in range(tokens.size - k + 1)]
    if not joined:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.array([zlib.crc32(s.encode()) for s in joined], dtype=np.uint64))


class MinHasher:
    """Actor-pool stage: doc text → (doc_id, band_id, band_hash) rows.

    Permutation parameters are built once per actor (``__init__``), the
    per-batch path is numpy matrix ops: minhash = min((a*x + b) mod p)
    over shingle hashes x, banded into ``bands`` groups of ``rows`` —
    docs sharing any (band_id, band_hash) are near-dup candidates.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 analyzer_cfg: AnalyzerConfig | None = None):
        assert num_perm % bands == 0
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands
        self.k = shingle_k
        self.a, self.b = _perm_params(num_perm)
        self.cfg = analyzer_cfg or AnalyzerConfig()

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        # (a * x + b) mod mersenne, min over shingles, per permutation
        x = shingles.reshape(-1, 1).astype(np.uint64)
        vals = (x * self.a + self.b) % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, terms = flat_terms(batch, self.cfg)
        t_np = terms.to_numpy(zero_copy_only=False) if len(terms) else np.empty(0, dtype=object)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_band, out_hash = [], [], []
        for i in range(batch.num_rows):
            toks = t_np[parent == i]
            sh = _shingle_hashes(toks, self.k)
            if sh.size == 0:
                continue
            sig = self.signature(sh)
            for bi in range(self.bands):
                band = sig[bi * self.rows : (bi + 1) * self.rows]
                bh = int.from_bytes(
                    hashlib.md5(band.tobytes() + bytes([bi])).digest()[:8], "little"
                )
                out_doc.append(int(doc_ids[i]))
                out_band.append(bi)
                out_hash.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(np.array(out_hash, dtype=np.uint64).view(np.int64)),
            }
        )


def _pairs_from_bucket(g: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    ids = np.unique(g["doc_id"].to_numpy())[:max_bucket]
    if ids.size < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
    a, b = np.triu_indices(ids.size, k=1)
    return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})


def minhash_candidate_pairs(ds, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                            concurrency: int = 4):
    """Dataset(doc_id, text) → distinct candidate pairs (doc_a, doc_b)."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    pairs = sigs.groupby(["band_id", "band_hash"]).map_groups(
        _pairs_from_bucket, batch_format="pandas"
    )
    from ray.data.aggregate import Count

    # distinct pairs (a doc pair can collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


def jaccard_verify(pairs_df: pd.DataFrame, texts: dict[int, str], shingle_k: int = 3,
                   cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Exact word-shingle Jaccard for candidate pairs (driver-side or
    inside map_batches with a broadcast doc→text dict for the candidate
    subset — candidates after LSH are small by construction)."""
    from hybrid_sanctions_search_engine_ray.functions.analyzer import get_analyzer

    analyzer = get_analyzer(cfg or AnalyzerConfig())
    cache: dict[int, set] = {}

    def sh(doc: int) -> set:
        if doc not in cache:
            toks = np.array(analyzer(texts.get(doc, "")), dtype=object)
            cache[doc] = set(_shingle_hashes(toks, shingle_k).tolist())
        return cache[doc]

    jac = []
    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        sa, sb = sh(int(a)), sh(int(b))
        inter = len(sa & sb)
        union = len(sa | sb)
        jac.append(inter / union if union else 0.0)
    out = pairs_df.copy()
    out["jaccard"] = np.round(jac, 6)
    return out


# --- SimHash ---------------------------------------------------------------


def simhash64(batch: pa.Table, cfg: AnalyzerConfig | None = None) -> pa.Table:
    """doc_id → 64-bit SimHash of tf-weighted token hashes."""
    import zlib

    cfg = cfg or AnalyzerConfig()
    parent, terms = flat_terms(batch, cfg)
    n = batch.num_rows
    out = np.zeros(n, dtype=np.uint64)
    if len(terms):
        t_np = terms.to_numpy(zero_copy_only=False)
        th = np.array(
            [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in t_np],
            dtype=np.uint64,
        )
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        weights = np.where(bits == 1, 1, -1)  # (n_tokens, 64)
        for d in range(n):
            w = weights[parent == d]
            if w.size == 0:
                continue
            v = w.sum(axis=0)
            out[d] = np.packbits((v > 0).astype(np.uint8)[::-1]).view(np.uint64)[0]
    return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out.view(np.int64))})
