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
import pyarrow.compute as pc

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


_GRAM_P = np.uint64(1_000_003)


def _token_hashes(tokens: np.ndarray) -> np.ndarray:
    """Stable 64-bit token hashes, vectorized via per-batch dedup
    (crc32 of the token and of its reverse, combined)."""
    import zlib

    from hybrid_sanctions_search_engine_ray.functions.hashing import factorize_exact

    codes, uniques = factorize_exact(tokens)
    uh = np.empty(len(uniques), dtype=np.uint64)
    for i, u in enumerate(uniques):
        b = u.encode("utf-8") if isinstance(u, str) else b""
        uh[i] = (np.uint64(zlib.crc32(b)) << np.uint64(32)) | np.uint64(zlib.crc32(b[::-1]))
    return uh[codes]


def _gram_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Polynomial k-gram hashes over consecutive token hashes (the
    vectorized shingle function shared by the signature and the
    exact-Jaccard verifier)."""
    h = token_hashes
    if h.size == 0:
        return np.empty(0, dtype=np.uint64)
    if h.size < k:
        out = np.zeros(1, dtype=np.uint64)
        for i in range(h.size):
            out = out * _GRAM_P + h[i]
        return out
    n = h.size - k + 1
    grams = np.zeros(n, dtype=np.uint64)
    for i in range(k):
        grams = grams * _GRAM_P + h[i : i + n]
    return grams


def _shingle_hashes(tokens: np.ndarray, k: int) -> np.ndarray:
    """Unique shingle hashes of one doc's token array."""
    return np.unique(_gram_hashes(_token_hashes(tokens), k))


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
        """Fully vectorized: flat gram hashes with cross-doc masking →
        per-doc segment-min over all permutations (np.minimum.reduceat)
        → polynomial band hashes. No per-document Python loop."""
        parent, terms = flat_terms(batch, self.cfg)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(terms) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                }
            )
        th = _token_hashes(terms.to_numpy(zero_copy_only=False))
        k = self.k
        # windows fully inside one doc (parent is nondecreasing)
        if th.size >= k:
            grams_all = _gram_hashes(th, k)
            valid = parent[: grams_all.size] == parent[k - 1 : k - 1 + grams_all.size]
            grams = grams_all[valid]
            gdoc = parent[: grams_all.size][valid]
        else:
            grams = np.empty(0, dtype=np.uint64)
            gdoc = np.empty(0, dtype=np.int64)
        # short docs (< k tokens): one whole-doc gram each
        counts = np.bincount(parent, minlength=batch.num_rows)
        short = np.flatnonzero((counts > 0) & (counts < k))
        if short.size:
            sg = np.empty(short.size, dtype=np.uint64)
            for j, d in enumerate(short):  # rare path: only tiny docs
                sg[j] = _gram_hashes(th[parent == d], k)[0]
            grams = np.concatenate([grams, sg])
            gdoc = np.concatenate([gdoc, short])
            order = np.argsort(gdoc, kind="stable")
            grams, gdoc = grams[order], gdoc[order]
        if grams.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                }
            )
        starts = np.flatnonzero(np.concatenate(([True], gdoc[1:] != gdoc[:-1])))
        present = gdoc[starts]
        # (G, P) permuted values; uint64 wrap-around is part of the hash
        vals = (grams[:, None] * self.a + self.b) % np.uint64(_MERSENNE)
        sig = np.minimum.reduceat(vals, starts, axis=0)  # (D, P)
        banded = sig.reshape(sig.shape[0], self.bands, self.rows)
        bh = np.zeros((sig.shape[0], self.bands), dtype=np.uint64)
        for r in range(self.rows):
            bh = bh * np.uint64(0x9E3779B97F4A7C15) + banded[:, :, r]
        bh += np.arange(self.bands, dtype=np.uint64)  # separate band spaces
        n_docs = present.size
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids[present], self.bands), pa.int64()),
                "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n_docs)),
                "band_hash": pa.array(bh.ravel().view(np.int64)),
            }
        )


def _pairs_from_partition(g: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    """One coarse partition of the LSH space → pairs from every
    (band_id, band_hash) bucket inside it. A single map_groups call
    handles thousands of buckets (grouping whole (band,hash) buckets
    into ~256 partitions avoids one Ray task per tiny bucket).

    Degenerate buckets (boilerplate text colliding thousands of docs)
    would emit O(B²) pairs; instead of silently dropping docs, buckets
    larger than ``max_bucket`` switch to STAR linking — every doc paired
    with the bucket's min doc id, O(B) pairs. Connectivity is preserved
    exactly (any two docs in the bucket remain joined through the hub),
    so connected-component dedup clusters are identical to all-pairs;
    only the redundant intra-cluster edges are elided, and the elision
    is LOGGED (no silent caps)."""
    import logging

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    starred = elided_pairs = 0
    sizes = g.groupby(["band_id", "band_hash"], sort=False)["doc_id"].nunique()
    multi = sizes[sizes > 1]
    if len(multi):
        grouped = g.set_index(["band_id", "band_hash"]).sort_index()
        for key in multi.index:
            ids = np.unique(grouped.loc[key, "doc_id"].to_numpy())
            if ids.size > max_bucket:
                # star: (hub=min id) × every other doc
                out_a.append(np.full(ids.size - 1, ids[0], dtype=ids.dtype))
                out_b.append(ids[1:])
                starred += 1
                elided_pairs += ids.size * (ids.size - 1) // 2 - (ids.size - 1)
            else:
                a, b = np.triu_indices(ids.size, k=1)
                out_a.append(ids[a])
                out_b.append(ids[b])
    if starred:
        logging.getLogger(__name__).warning(
            "LSH: %d bucket(s) over %d docs used star linking; %d redundant "
            "intra-cluster pairs elided (connectivity preserved)",
            starred, max_bucket, elided_pairs,
        )
    if not out_a:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)})
    return pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})


def minhash_candidate_pairs(ds, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                            concurrency: int = 4, space_partitions: int = 256):
    """Dataset(doc_id, text) → distinct candidate pairs (doc_a, doc_b).

    The LSH-space shuffle is coarsened: band buckets hash into
    ``space_partitions`` groups (a bucket never straddles partitions, so
    no pair is lost), then pairs are built vectorized within each."""
    import pyarrow.compute as pc

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def add_space(b: pa.Table) -> pa.Table:
        h = b["band_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        return b.append_column("space", pa.array((h % space_partitions).astype(np.int32)))

    pairs = (
        sigs.map_batches(add_space, batch_format="pyarrow")
        .groupby("space")
        .map_groups(_pairs_from_partition, batch_format="pandas")
    )
    from ray.data.aggregate import Count

    # distinct pairs (a doc pair can collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


def _shingle_set_fn(texts: dict[int, str], shingle_k: int,
                    cfg: AnalyzerConfig | None):
    """Shared cached doc→shingle-hash-set lookup for the pair verifiers
    (jaccard_verify / containment_verify) — one copy of the analyzer
    setup and cache closure (code-review r05 reuse finding)."""
    from hybrid_sanctions_search_engine_ray.functions.analyzer import get_analyzer

    analyzer = get_analyzer(cfg or AnalyzerConfig())
    cache: dict[int, set] = {}

    def sh(doc: int) -> set:
        if doc not in cache:
            toks = np.array(analyzer(texts.get(doc, "")), dtype=object)
            cache[doc] = set(_shingle_hashes(toks, shingle_k).tolist())
        return cache[doc]

    return sh


def jaccard_verify(pairs_df: pd.DataFrame, texts: dict[int, str], shingle_k: int = 3,
                   cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Exact word-shingle Jaccard for candidate pairs (driver-side or
    inside map_batches with a broadcast doc→text dict for the candidate
    subset — candidates after LSH are small by construction)."""
    sh = _shingle_set_fn(texts, shingle_k, cfg)
    jac = []
    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        sa, sb = sh(int(a)), sh(int(b))
        inter = len(sa & sb)
        union = len(sa | sb)
        jac.append(inter / union if union else 0.0)
    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away

    out = pairs_df.copy()
    out["jaccard"] = round_half_away(np.asarray(jac, dtype=np.float64), 6)  # DuckDB ROUND parity
    return out


# --- SimHash ---------------------------------------------------------------


def _token_hashes_md5(tokens: np.ndarray) -> np.ndarray:
    """64-bit token hashes with DuckDB ``md5_number_upper`` parity
    (little-endian int of the digest's FIRST 8 bytes — the repo-wide
    SQL-checkable hash convention); per-batch factorize so each unique
    token is hashed once."""
    from hybrid_sanctions_search_engine_ray.functions.hashing import factorize_exact

    codes, uniques = factorize_exact(tokens)
    uh = np.empty(len(uniques), dtype=np.uint64)
    for i, u in enumerate(uniques):
        b = u.encode("utf-8") if isinstance(u, str) else b""
        uh[i] = int.from_bytes(hashlib.md5(b).digest()[:8], "little")
    return uh[codes]


def simhash64(batch: pa.Table, cfg: AnalyzerConfig | None = None,
              hasher: str = "crc") -> pa.Table:
    """doc_id → 64-bit SimHash of token hashes, vectorized: ±1 bit
    weights summed per doc with ``np.add.reduceat`` (parent indices are
    nondecreasing), sign bits packed back — no per-doc Python loop.
    ``hasher="md5"`` swaps in the DuckDB-parity token hash, making the
    whole signature SQL-checkable (the exact-oracle variant); "crc" is
    the faster default shared with the MinHash machinery."""
    cfg = cfg or AnalyzerConfig()
    parent, terms = flat_terms(batch, cfg)
    n = batch.num_rows
    out = np.zeros(n, dtype=np.uint64)
    if len(terms):
        hash_fn = _token_hashes_md5 if hasher == "md5" else _token_hashes
        th = hash_fn(terms.to_numpy(zero_copy_only=False))
        starts = np.flatnonzero(np.concatenate(([True], parent[1:] != parent[:-1])))
        present = parent[starts]
        # bit matrix via unpackbits (C-speed), per-doc ONES counts via
        # reduceat in the narrowest safe dtype — the (n_tokens, 64)
        # intermediate dominates this kernel's cost, and int16 runs ~30×
        # faster than int32 here (cache-resident). sign bit = majority of
        # ones: weightsum = 2·ones − count > 0  ⇔  2·ones > count.
        bits8 = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        counts = np.diff(np.append(starts, len(th)))
        acc_dt = np.int16 if counts.max() < (1 << 15) else np.int64
        ones = np.add.reduceat(bits8.astype(acc_dt), starts, axis=0).astype(np.int64)
        sign = (2 * ones) > counts[:, None]
        packed = (sign.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        out[present] = packed
    return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out.view(np.int64))})


def sorted_neighborhood_pairs(ds, id_col: str, key_col: str, window: int = 4):
    """Sorted-neighborhood blocking (Hernández–Stolfo record linkage):
    sort by a normalized blocking key, slide a ``window``-row window,
    emit every in-window candidate pair — the O(n·w) alternative to
    LSH when a meaningful sort key exists (names, here a text prefix).

    Distribution shape: ONE range-partitioning sort on (key, id); each
    sorted block emits its internal window pairs vectorized, PLUS its
    first/last ``window−1`` rows as tagged boundary rows. The driver
    stitches ADJACENT blocks only: with tail rows t_i (i=0..w−2) and
    next block's head rows h_j, global rank distance is w−1+j−i, so the
    cross-boundary pairs are exactly {(t_i, h_j): j ≤ i} — no global
    rank materialization. Boundary traffic is O(#blocks · w).
    ASSUMPTION (checked, clear error): every sorted block holds ≥
    ``window`` rows, so pairs never span three blocks — true whenever
    block size ≫ w, the only regime the method makes sense in.
    Returns (doc_a, doc_b, key_a, key_b) with doc_a < doc_b."""
    import pandas as pd

    w = int(window)
    if w < 2:
        raise ValueError("window must be >= 2")
    # the driver stitches blocks by the STRING of each block's first
    # key; for a non-string key column that lexicographic order would
    # diverge from the dataset's native sort ("10" < "9") and mis-pair
    # block boundaries silently (code-review r05 finding)
    _kt = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    # Ray schemas carry Arrow types for Arrow blocks but numpy/Python
    # types for pandas blocks — reject only provably non-string keys
    _bad = (isinstance(_kt, pa.DataType)
            and not (pa.types.is_string(_kt) or pa.types.is_large_string(_kt))) \
        or (isinstance(_kt, np.dtype) and _kt.kind not in ("U", "S", "O")) \
        or (isinstance(_kt, type) and _kt not in (str, object))
    if _bad:
        raise TypeError(
            f"sorted_neighborhood_pairs: key column {key_col!r} is {_kt} — "
            "string blocking keys required (cast or zero-pad numerics so "
            "lexicographic order equals the intended order)")

    def block_pairs(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.asarray(b[key_col].to_pylist(), dtype=object)
        n = ids.size
        if n == 0:
            # fixed-schema empty table: pa.array([]) is null-typed and
            # can fail strict schema unification downstream (r05 review)
            return pa.table({
                "kind": pa.array([], pa.string()),
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "key_a": pa.array([], pa.string()),
                "key_b": pa.array([], pa.string()),
                "pos": pa.array([], pa.int64()),
                "block_key0": pa.array([], pa.string()),
                "block_id0": pa.array([], pa.int64()),
            })
        if 0 < n < w:
            raise ValueError(
                f"sorted_neighborhood_pairs: a sorted block has {n} < window={w} rows; "
                "lower the window or repartition to fewer, larger blocks"
            )
        a_idx, b_idx = [], []
        for d in range(1, w):
            a_idx.append(np.arange(0, n - d))
            b_idx.append(np.arange(d, n))
        ai = np.concatenate(a_idx) if a_idx and n > 1 else np.empty(0, np.int64)
        bi = np.concatenate(b_idx) if b_idx and n > 1 else np.empty(0, np.int64)
        head = min(w - 1, n)
        rows = {
            "kind": ["pair"] * ai.size + ["head"] * head + ["tail"] * head,
            "doc_a": np.r_[ids[ai], ids[:head], ids[n - head:]],
            "doc_b": np.r_[ids[bi], np.zeros(2 * head, np.int64)],
            "key_a": np.r_[keys[ai], keys[:head], keys[n - head:]],
            "key_b": np.r_[keys[bi], np.array([""] * (2 * head), dtype=object)],
            "pos": np.r_[np.zeros(ai.size, np.int64),
                         np.arange(head), np.arange(head)],
            # block identity = the first row's (key, id), kept as two
            # typed columns: a concatenated string would need padding
            # and a separator below the key alphabet to sort like the
            # (key, id) tuple ("9" > "10" as strings mis-stitched
            # adjacent blocks before this was split out).
            "block_key0": ([""] * ai.size + [str(keys[0])] * (2 * head)),
            "block_id0": np.r_[np.zeros(ai.size, np.int64),
                               np.full(2 * head, ids[0], np.int64)],
        }
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    out = (
        ds.sort([key_col, id_col])
        .map_batches(block_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    pairs = out[out["kind"] == "pair"][["doc_a", "doc_b", "key_a", "key_b"]]
    bnd = out[out["kind"] != "pair"]
    stitched = []
    blocks = list(
        bnd[["block_key0", "block_id0"]].drop_duplicates()
        .sort_values(["block_key0", "block_id0"], kind="mergesort")
        .itertuples(index=False, name=None))
    for prev, nxt in zip(blocks, blocks[1:]):
        tail = bnd[(bnd["block_key0"] == prev[0]) & (bnd["block_id0"] == prev[1])
                   & (bnd["kind"] == "tail")].sort_values("pos")
        head = bnd[(bnd["block_key0"] == nxt[0]) & (bnd["block_id0"] == nxt[1])
                   & (bnd["kind"] == "head")].sort_values("pos")
        for i, (_, t) in enumerate(tail.iterrows()):
            for j, (_, h) in enumerate(head.iterrows()):
                if j <= i:
                    stitched.append({"doc_a": t["doc_a"], "doc_b": h["doc_a"],
                                     "key_a": t["key_a"], "key_b": h["key_a"]})
    if stitched:
        pairs = pd.concat([pairs, pd.DataFrame(stitched)], ignore_index=True)
    a = pairs["doc_a"].to_numpy(dtype=np.int64)
    b = pairs["doc_b"].to_numpy(dtype=np.int64)
    ka = pairs["key_a"].to_numpy(dtype=object)
    kb = pairs["key_b"].to_numpy(dtype=object)
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    ka2 = np.where(swap, kb, ka)
    kb2 = np.where(swap, ka, kb)
    res = pd.DataFrame({"doc_a": a2, "doc_b": b2, "key_a": ka2, "key_b": kb2})
    res = res.drop_duplicates(["doc_a", "doc_b"]).sort_values(
        ["doc_a", "doc_b"], kind="mergesort").reset_index(drop=True)
    return res


def dup_ngram_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                    n: int = 8, min_docs: int = 2, top: int = 50):
    """Exact duplicated-substring detection à la "Deduplicating Training
    Data Makes Language Models Better" (Lee et al., 2022): find word
    ``n``-grams that recur across ≥ ``min_docs`` distinct documents —
    the training-data memorization/boilerplate signal that exact
    doc-level dedup misses (Lee et al. use suffix arrays over 50-token
    spans; the n-gram-keyed shuffle below is the distributed-friendly
    equivalent at fixed span length).

    Engine shape (two map-only corpus passes, ONE small shuffle — raw
    strings never shuffle):

    1. **Hash pass** — per batch, fully vectorized: Arrow
       ``split_pattern`` → per-unique-token 64-bit hash (factorized, so
       each distinct token hashes once per batch) → gram keys as a
       rolling polynomial over shifted uint64 arrays (n−1 vectorized
       multiply-adds, wraparound mod 2^64) → per-(doc, gram) counts via
       one C-speed pandas groupby. Only (gram_h, occ_p, docs_p) int64
       partials leave the task; the shuffle is keyed on the 64-bit hash.
    2. ``min_docs`` filter + sort-free global top-N over the
       (duplicated-gram-count-sized) aggregate → an exact occurrence
       cutoff; every gram at-or-above the cutoff is a candidate (so
       string tie-breaks at the boundary stay exact).
    3. **Resolve pass** — candidate hashes broadcast once (``ray.put``);
       a second map-only corpus scan materializes gram STRINGS only for
       candidate hits (searchsorted membership, then a join over the
       handful of matching positions). Driver-side work is bounded by
       the candidate count, never the corpus.

    Hash collisions (64-bit, corpus-distinct-gram scale) are
    birthday-bounded far below any realistic gram count; a collision
    would merge two grams' counts — the same trade Lee et al.'s hashed
    variants make.

    Tokenization is a bare single-space split (DuckDB
    ``string_split(text, ' ')`` parity; empty tokens from runs of
    spaces are preserved on both sides). Returns the top ``top`` grams
    by (n_occ desc, gram asc) as a Dataset of (gram, n_occ, n_docs).
    """
    import zlib

    import ray
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.relational import global_topn

    K = np.uint64(0x9E3779B97F4A7C15)
    _EMPTY_TOKS = (None, None, None, None)

    def _batch_gram_hashes(b: pa.Table):
        """(flat_tokens Arrow array, gram_hash uint64 per valid start,
        flat start positions, doc index per valid start). Token → hash
        goes through Arrow ``dictionary_encode`` so the 10M+ flat token
        strings never become Python objects — only the (small) per-batch
        vocabulary is hashed in Python."""
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(pc.coalesce(texts, ""), " ")
        flat = toks.values
        L = len(flat)
        if L < n:
            return _EMPTY_TOKS
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy()
        uniques = denc.dictionary.to_pylist()
        uh = np.empty(len(uniques), dtype=np.uint64)
        for i, u in enumerate(uniques):
            bts = u.encode("utf-8") if isinstance(u, str) else b""
            uh[i] = (np.uint64(zlib.crc32(bts)) << np.uint64(32)) | np.uint64(
                zlib.crc32(bts[::-1])
            )
        th = uh[codes]
        m = L - n + 1
        g = th[:m].copy()
        for j in range(1, n):
            g = g * K + th[j:j + m]
        lens = np.diff(toks.offsets.to_numpy())
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        valid = doc_idx[:m] == doc_idx[n - 1:]
        starts = np.nonzero(valid)[0]
        if not len(starts):
            return _EMPTY_TOKS
        return flat, g[starts], starts, doc_idx[starts]

    from hybrid_sanctions_search_engine_ray.stages.postings import (
        _unpack_group,
        pack_postings_by_part,
    )

    P = 16  # gram-hash partitions for the packed combine shuffle
    _packed_schema = pa.schema([("part", pa.int32()), ("payload", pa.binary())])

    def partial(b: pa.Table) -> pa.Table:
        _, gh, _, didx = _batch_gram_hashes(b)
        if gh is None:
            return _packed_schema.empty_table()
        per = (
            pd.DataFrame({"d": didx, "g": gh.view(np.int64)})
            .groupby(["d", "g"], sort=False)
            .size()
            .reset_index(name="c")
        )
        agg_b = per.groupby("g", sort=False).agg(
            occ_p=("c", "sum"), docs_p=("c", "size")
        ).reset_index()
        gvals = agg_b["g"].to_numpy(np.int64)
        t = pa.table({
            "gram_h": pa.array(gvals, pa.int64()),
            "occ_p": pa.array(agg_b["occ_p"].to_numpy(np.int64), pa.int64()),
            "docs_p": pa.array(agg_b["docs_p"].to_numpy(np.int64), pa.int64()),
            "part": pa.array((gvals % P).astype(np.int32)),
        })
        # packed map-side combine (stages/postings pattern): the shuffle
        # moves tasks × P IPC blobs, not one row per distinct gram
        return pack_postings_by_part(t)

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        tbl = _unpack_group(g)
        agg = tbl.groupby("gram_h", sort=False).agg(
            n_occ=("occ_p", "sum"), n_docs=("docs_p", "sum")
        ).reset_index()
        agg = agg[agg["n_docs"] >= min_docs]
        return agg.astype({"n_occ": np.int64, "n_docs": np.int64})

    _empty_out = pd.DataFrame({
        "gram": pd.Series([], dtype=str),
        "n_occ": pd.Series([], dtype=np.int64),
        "n_docs": pd.Series([], dtype=np.int64),
    })
    # duplicated-gram-count-sized (min_docs prunes the unique-gram mass);
    # pinned so the cutoff probe and the candidate filter don't re-run
    # the corpus pass
    survivors = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pandas")
        .materialize()
    )
    topn = global_topn(
        survivors, by=[("n_occ", False), ("gram_h", True)], n=top
    ).to_pandas()
    if topn.empty:
        return rd.from_pandas(_empty_out)
    if len(topn) >= top:
        cutoff = int(topn["n_occ"].min())
        cands = survivors.map_batches(
            lambda b: b.filter(pc.greater_equal(b["n_occ"], cutoff)),
            batch_format="pyarrow",
        ).to_pandas()
    else:
        cands = survivors.to_pandas()

    cand_h = np.sort(cands["gram_h"].to_numpy(np.int64))
    ref = ray.put(cand_h)
    _pair_schema = pa.schema([("gram_h", pa.int64()), ("gram", pa.string())])

    def resolve(b: pa.Table, cand_ref) -> pa.Table:
        ch = ray.get(cand_ref)
        flat_toks, gh, starts, _ = _batch_gram_hashes(b)
        if gh is None:
            return _pair_schema.empty_table()
        ghs = gh.view(np.int64)
        idx = np.searchsorted(ch, ghs)
        idx[idx == len(ch)] = 0
        hit = ch[idx] == ghs
        if not hit.any():
            return _pair_schema.empty_table()
        sub = pd.DataFrame({"h": ghs[hit], "p": starts[hit]}).drop_duplicates("h")
        grams = [
            " ".join(flat_toks.slice(p, n).to_pylist())
            for p in sub["p"].to_numpy()
        ]
        return pa.table({"gram_h": pa.array(sub["h"].to_numpy(), pa.int64()),
                         "gram": pa.array(grams, pa.string())})

    pairs = (
        ds.map_batches(resolve, batch_format="pyarrow", fn_kwargs={"cand_ref": ref})
        .to_pandas()
    )
    # candidate-count × block bounded; min() guards the (negligible)
    # collision case deterministically
    strings = pairs.groupby("gram_h", sort=False)["gram"].min().reset_index()
    out = (
        cands.merge(strings, on="gram_h", how="inner")
        .sort_values(["n_occ", "gram"], ascending=[False, True], kind="mergesort")
        .head(top)
        .reset_index(drop=True)
    )
    out = out[["gram", "n_occ", "n_docs"]].astype(
        {"n_occ": np.int64, "n_docs": np.int64}
    )
    return rd.from_pandas(out if len(out) else _empty_out)


# --- line-level dedup (C4 / RefinedWeb) -------------------------------------


def line_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
               line_len: int = 8):
    """C4/RefinedWeb-style line-level exact dedup: drop every later copy
    of a repeated *line*, keeping only its first occurrence corpus-wide
    (C4 keeps one of each three-sentence span; RefinedWeb/Dolma dedup at
    line granularity). This corpus carries no newlines, so the
    deterministic "line" unit is the non-overlapping ``line_len``-token
    chunk of the simple-analyzer token stream; first = smallest
    ``(doc_id, chunk_idx)``.

    Scale shape — ONE corpus scan, two exchanges, no joins, no
    broadcast:

    1. map: vectorized tokenize (Arrow ``split_pattern_regex``), chunk
       lines joined per length class via ``binary_join_element_wise``
       (≤ ``line_len`` C++ calls per batch), map-side combine collapses
       within-batch copies; each doc also emits ONE sentinel row
       (``\\x00``-prefixed — real tokens are letter/digit only, so no
       collision) carrying its total line count.
    2. ``groupby(line)`` with ``Min(packed)`` — the keep-first winner —
       where ``packed = doc_id * 2^20 + chunk_idx`` (turn length is
       capped far below 2^20 chunks). Winner rows ARE the kept lines,
       so per-doc kept counts need no join back to the corpus.
    3. one doc-keyed sum over (winner + sentinel) rows — doc-count-sized.

    Returns a Dataset of ``(doc_id, n_lines, n_kept, kept_tokens)`` per
    document with ≥1 token. Exact DuckDB twin in ``__ray_entry__``
    (``line_dedup``).
    """
    from ray.data.aggregate import Min, Sum

    from hybrid_sanctions_search_engine_ray.stages.analyze import (
        _SIMPLE_RE2,
        _lower_nfc,
    )

    PACK = np.int64(1) << np.int64(20)
    _schema = pa.schema([
        ("line", pa.string()),
        ("packed", pa.int64()),
        ("n_toks", pa.int64()),
        ("cnt", pa.int64()),
    ])

    def emit_lines(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = b[id_col].to_numpy().astype(np.int64)
        tokens = pc.split_pattern_regex(_lower_nfc(texts), _SIMPLE_RE2)
        flat = pc.list_flatten(tokens)
        parent = pc.list_parent_indices(tokens)
        keep = pc.greater(pc.utf8_length(flat), 0)
        flat = flat.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = parent.filter(keep)
        if len(flat) == 0:
            return _schema.empty_table()
        p = parent.to_numpy(zero_copy_only=False).astype(np.int64)
        n = p.size
        # position within doc over the nondecreasing parent index
        seg_start = np.r_[0, np.flatnonzero(np.diff(p)) + 1]
        seg_len = np.diff(np.r_[seg_start, n])
        pos = np.arange(n, dtype=np.int64) - np.repeat(seg_start, seg_len)
        starts = np.flatnonzero(pos % line_len == 0)
        seg_end = np.repeat(seg_start + seg_len, seg_len)  # per flat token
        k = np.minimum(line_len, seg_end[starts] - starts)
        # join each length class in one Arrow C++ call
        lines = np.empty(starts.size, dtype=object)
        for kk in range(1, line_len + 1):
            sel = np.flatnonzero(k == kk)
            if not sel.size:
                continue
            s = starts[sel]
            parts = [flat.take(pa.array(s + j)) for j in range(kk)]
            joined = (parts[0] if kk == 1
                      else pc.binary_join_element_wise(*parts, " "))
            lines[sel] = joined.to_numpy(zero_copy_only=False)
        chunk_idx = pos[starts] // line_len
        if chunk_idx.size and int(chunk_idx.max()) >= int(PACK):
            raise ValueError(
                f"document exceeds {int(PACK)} chunks — raise the packed-key "
                f"shift (doc length cap is far below this by contract)")
        packed = ids[p[starts]] * PACK + chunk_idx
        per = (
            pd.DataFrame({"line": lines, "packed": packed,
                          "n_toks": k.astype(np.int64)})
            .groupby("line", sort=False)
            .agg(packed=("packed", "min"), n_toks=("n_toks", "min"))
            .reset_index()
        )
        per["cnt"] = np.int64(0)
        # one sentinel per doc: cnt = its line count (docs are whole rows,
        # so each appears in exactly one batch)
        docs_here = np.unique(p)
        n_lines_doc = np.bincount(p[starts], minlength=int(p.max()) + 1)[docs_here]
        sent = pd.DataFrame({
            "line": ["\x00" + str(ids[d]) for d in docs_here],
            "packed": ids[docs_here] * PACK,
            "n_toks": np.int64(0),
            "cnt": n_lines_doc.astype(np.int64),
        })
        out = pd.concat([per, sent], ignore_index=True)
        return pa.Table.from_pandas(out, schema=_schema, preserve_index=False)

    agg = (
        ds.map_batches(emit_lines, batch_format="pyarrow")
        .groupby("line")
        .aggregate(
            Min("packed", alias_name="win"),
            Min("n_toks", alias_name="toks"),
            Sum("cnt", alias_name="cnt_sum"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        win = b["win"].to_numpy().astype(np.int64)
        cnt = b["cnt_sum"].to_numpy().astype(np.int64)
        toks = b["toks"].to_numpy().astype(np.int64)
        is_sent = cnt > 0  # real lines always carry cnt 0
        return pa.table({
            "doc_id": pa.array(win // PACK, pa.int64()),
            "n_lines": pa.array(np.where(is_sent, cnt, 0), pa.int64()),
            "n_kept": pa.array(np.where(is_sent, 0, 1), pa.int64()),
            "kept_tokens": pa.array(np.where(is_sent, 0, toks), pa.int64()),
        })

    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_lines", alias_name="n_lines"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("kept_tokens", alias_name="kept_tokens"),
        )
    )


# --- Content-defined chunking (CDC) ----------------------------------------

_CDC_A = np.int64(37)        # order-16 mod 64 (31 has order 2 — biased); sum < 2^63
_CDC_W = 8                   # window (codepoints)
_CDC_MASK = np.int64(64)     # boundary when H % 64 == 0 → ~64-char chunks
# Odd multipliers for the two chunk-fingerprint lanes (splitmix64 / xxhash
# constants); odd → invertible mod 2^64, so anchored prefix differences
# recover the chunk-local polynomial exactly.
_CDC_P1 = 0x9E3779B97F4A7C15
_CDC_P2 = 0xC2B2AE3D27D4EB4F


def _u64_inv(a: int) -> int:
    """Multiplicative inverse of odd ``a`` mod 2^64 (Newton iteration)."""
    x = a
    for _ in range(6):
        x = (x * (2 - a * x)) % (1 << 64)
    return x


def cdc_chunk_stats(ds, text_col: str = "text"):
    """Content-defined chunking (the LBFS/restic Rabin-split dedup-
    storage primitive, Muthitacharoen et al. SOSP'01): a chunk boundary
    falls after 1-based codepoint position p (window p−7..p, p ≤ len−1)
    whenever the polynomial rolling hash

        H(p) = Σ_{k=0..7} cp(p−k) · 37^k      (int64, no overflow)

    satisfies ``H % 64 == 0`` — boundaries move with CONTENT, so an
    insertion only re-chunks its neighbourhood (the property fixed-size
    blocks lack). Returns one summary row: docs chunked, total chunks,
    DISTINCT chunks (cross-doc chunk dedup, the storage win CDC exists
    for), mean chunk length (round4).

    Round-4 shape — fully vectorized, nothing pinned:
    - The batch's documents are concatenated into ONE flat codepoint
      array (a single ``utf-32-le`` reinterpret per doc); the 8-term
      window hash is eight shifted vector multiplies over the flat
      array, with candidates crossing a document edge masked out by two
      vectorized ``searchsorted`` range checks. No per-doc Python loop
      in the hot path.
    - Chunk identity is a 128-bit anchored polynomial fingerprint
      (two independent lanes mod 2^64): with prefix sums
      ``P[i] = Σ_{k<i} cp[k]·A^k`` the chunk a..e hashes to
      ``(P[e] − P[a]) · A^{−a}``, all uint64 wraparound cumsums /
      cumprods — the per-chunk ``hashlib.md5`` Python loop is gone.
      The DISTINCT count needs only an injective content fingerprint,
      not md5 parity: equal chunks collide by construction, unequal
      chunks collide with ~2⁻¹²⁸ probability (chunk length is part of
      the key too), so the SQL twin's ``count(DISTINCT substring)``
      matches.
    - ONE exchange total: per-batch pre-deduped fingerprint rows plus a
      sentinel scalar row ride the same (kind, fingerprint) groupby; a
      tiny post-aggregation map emits per-block partials (distinct
      count + scalar sums) and the driver adds them up. No
      ``materialize()`` anywhere.
    The published scheme's min/max chunk clamps are omitted (they make
    boundary selection sequential); documented deviation — pure
    content-defined boundaries, exactly SQL-twinnable.
    """
    from ray.data.aggregate import Sum

    inv1 = _u64_inv(_CDC_P1)
    inv2 = _u64_inv(_CDC_P2)

    def chunk_batch(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pandas().to_numpy(dtype=object)
        bufs = [(s or "").encode("utf-32-le") for s in texts]
        lens = np.array([len(x) >> 2 for x in bufs], dtype=np.int64)
        n_docs = int((lens > 0).sum())
        n_chars = int(lens.sum())
        off = np.concatenate([[0], np.cumsum(lens)])
        flat = (np.frombuffer(b"".join(bufs), dtype=np.uint32).astype(np.int64)
                if n_chars else np.empty(0, np.int64))
        N = flat.size

        # boundary candidates over the FLAT array, doc-edge-masked
        bp_flat = np.empty(0, dtype=np.int64)
        if N >= _CDC_W + 1:
            h = np.zeros(N - _CDC_W + 1, dtype=np.int64)
            for k in range(_CDC_W):
                h += flat[_CDC_W - 1 - k: N - k] * (_CDC_A ** k)
            cand = np.flatnonzero(h % _CDC_MASK == 0) + _CDC_W  # 1-based flat pos
            if cand.size:
                d = np.searchsorted(off, cand - 1, side="right") - 1
                ok = (cand - _CDC_W >= off[d]) & (cand <= off[d + 1] - 1)
                bp_flat = cand[ok]

        doc_start = off[:-1][lens > 0]
        doc_end = off[1:][lens > 0]
        starts = np.sort(np.concatenate([doc_start, bp_flat]))
        ends = np.sort(np.concatenate([bp_flat, doc_end]))
        n_chunks = ends.size

        # 128-bit anchored polynomial fingerprints, all-vector uint64
        u = flat.astype(np.uint64)
        with np.errstate(over="ignore"):
            pw1 = np.cumprod(np.full(N, np.uint64(_CDC_P1)), dtype=np.uint64)
            pw1 = np.concatenate([[np.uint64(1)], pw1[:-1]]) if N else pw1
            pw2 = np.cumprod(np.full(N, np.uint64(_CDC_P2)), dtype=np.uint64)
            pw2 = np.concatenate([[np.uint64(1)], pw2[:-1]]) if N else pw2
            pi1 = np.cumprod(np.full(N, np.uint64(inv1)), dtype=np.uint64)
            pi1 = np.concatenate([[np.uint64(1)], pi1[:-1]]) if N else pi1
            pi2 = np.cumprod(np.full(N, np.uint64(inv2)), dtype=np.uint64)
            pi2 = np.concatenate([[np.uint64(1)], pi2[:-1]]) if N else pi2
            P1 = np.concatenate([[np.uint64(0)], np.cumsum(u * pw1, dtype=np.uint64)])
            P2 = np.concatenate([[np.uint64(0)], np.cumsum(u * pw2, dtype=np.uint64)])
            h1 = ((P1[ends] - P1[starts]) * pi1[starts]).view(np.int64) \
                if n_chunks else np.empty(0, np.int64)
            h2 = ((P2[ends] - P2[starts]) * pi2[starts]).view(np.int64) \
                if n_chunks else np.empty(0, np.int64)
        clen = ends - starts

        # map-side combine: distinct fingerprints within the batch
        fp = pa.table({"h1": pa.array(h1, pa.int64()),
                       "h2": pa.array(h2, pa.int64()),
                       "clen": pa.array(clen, pa.int64())})
        fp = fp.group_by(["h1", "h2", "clen"]).aggregate([([], "count_all")])
        n_u = fp.num_rows
        z = np.zeros(n_u, np.int64)
        return pa.table({
            "kind": pa.array(np.concatenate([[0], np.ones(n_u, np.int64)]), pa.int8()),
            "h1": pa.array(np.concatenate([[0], fp["h1"].to_numpy()]), pa.int64()),
            "h2": pa.array(np.concatenate([[0], fp["h2"].to_numpy()]), pa.int64()),
            "clen": pa.array(np.concatenate([[0], fp["clen"].to_numpy()]), pa.int64()),
            "n_docs": pa.array(np.concatenate([[n_docs], z]), pa.int64()),
            "n_chunks": pa.array(np.concatenate([[n_chunks], z]), pa.int64()),
            "n_chars": pa.array(np.concatenate([[n_chars], z]), pa.int64()),
        })

    def partials(b: pa.Table) -> pa.Table:
        kind = b["kind"].to_numpy(zero_copy_only=False)
        return pa.table({
            "distinct_p": pa.array([int((kind == 1).sum())], pa.int64()),
            "d_p": pa.array([int(pc.sum(b["n_docs"]).as_py() or 0)], pa.int64()),
            "c_p": pa.array([int(pc.sum(b["n_chunks"]).as_py() or 0)], pa.int64()),
            "ch_p": pa.array([int(pc.sum(b["n_chars"]).as_py() or 0)], pa.int64()),
        })

    tot = (
        ds.map_batches(chunk_batch, batch_format="pyarrow")
        .groupby(["kind", "h1", "h2", "clen"])
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_chunks", alias_name="n_chunks"),
                   Sum("n_chars", alias_name="n_chars"))
        .map_batches(partials, batch_format="pyarrow")
        .to_pandas()
    )
    n_chunks = int(tot["c_p"].sum())
    n_chars = int(tot["ch_p"].sum())
    mean_len = 0.0 if n_chunks == 0 else \
        float(np.floor(n_chars / n_chunks * 1e4 + 0.5) / 1e4)
    return pd.DataFrame({
        "n_docs": [np.int64(tot["d_p"].sum())],
        "n_chunks": [np.int64(n_chunks)],
        "n_distinct_chunks": [np.int64(tot["distinct_p"].sum())],
        "mean_chunk_len": [mean_len],
    })


def containment_verify(pairs_df: pd.DataFrame, texts: dict[int, str],
                       shingle_k: int = 3,
                       cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Exact shingle CONTAINMENT for candidate pairs (Broder '97's
    asymmetric companion to resemblance): ``cont_a = |A∩B| / |A|``,
    ``cont_b = |A∩B| / |B|``, ``containment = max`` — catches a short
    document embedded verbatim in a long one, which Jaccard dilutes
    toward 0 (the quote / boilerplate-inclusion dedup case). Same
    broadcast-candidate-subset shape as jaccard_verify."""
    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away

    sh = _shingle_set_fn(texts, shingle_k, cfg)
    ca, cb = [], []
    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        sa, sb = sh(int(a)), sh(int(b))
        inter = len(sa & sb)
        ca.append(inter / len(sa) if sa else 0.0)
        cb.append(inter / len(sb) if sb else 0.0)
    out = pairs_df.copy()
    out["cont_a"] = round_half_away(np.asarray(ca, dtype=np.float64), 6)
    out["cont_b"] = round_half_away(np.asarray(cb, dtype=np.float64), 6)
    out["containment"] = np.maximum(out["cont_a"], out["cont_b"])
    return out


# --- winnowing fingerprints (Schleimer et al., SIGMOD'03) -------------------

_WIN_POS_CAP = 1 << 20   # the SQL twin packs (hash, pos) into one HUGEINT key


def winnow_fingerprints(ds, k: int = 3, w: int = 4,
                        cfg: AnalyzerConfig | None = None) -> pd.DataFrame:
    """Winnowing document fingerprints (the MOSS plagiarism-detection
    algorithm, Schleimer/Wilkerson/Aiken SIGMOD'03): hash every
    ``k``-token gram, slide a ``w``-gram window over the hash sequence,
    and from each window select the MINIMUM hash (ties → rightmost
    position). The guarantee: any shared run of ≥ w+k-1 tokens between
    two documents shares at least one selected fingerprint — local
    fingerprinting with bounded gap, the third member of the
    fingerprint family beside CDC chunking (storage dedup) and
    dup-span detection (training-data dedup). Variant note: leading
    partial windows are included (standard SQL frame semantics,
    ``ROWS w-1 PRECEDING``), so documents shorter than w+k-1 tokens
    still fingerprint — a documented deviation from the paper, which
    assumes m ≥ w.

    Returns ONE summary row (n_docs, n_grams, n_fingerprints,
    n_distinct_fp) — n_fingerprints counts distinct selected (doc, pos)
    sites, n_distinct_fp distinct fingerprint hash VALUES corpus-wide.

    Scale shape: one streaming tokenize pass; grams built by vectorized
    shifted joins over the flat token array (doc edges masked), hashed
    with the md5_number_upper parity contract (per-batch factorize →
    one md5 per DISTINCT gram); window minima via one
    ``sliding_window_view`` matrix per batch (m × w uint64, rightmost
    argmin by reversed-argmin); the ONLY exchange is the per-batch
    pre-deduped distinct-fingerprint rows + a sentinel scalar row
    through a hash-keyed groupby (the cdc_chunk_stats pattern). Nothing
    materialized."""
    import hashlib as _hl

    from ray.data.aggregate import Sum

    from hybrid_sanctions_search_engine_ray.functions.hashing import factorize_exact

    cfg = cfg or AnalyzerConfig()
    U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

    def fp_batch(b: pa.Table) -> pa.Table:
        parent, terms = flat_terms(b, cfg)
        tarr = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        n = parent.size
        if n >= k:
            same = parent[: n - k + 1] == parent[k - 1:]
            gidx = np.flatnonzero(same)          # flat start positions of grams
        else:
            gidx = np.empty(0, dtype=np.int64)
        n_docs = int(np.unique(parent[gidx]).size) if gidx.size else 0
        m = gidx.size
        if m == 0:
            return pa.table({
                "kind": pa.array([0], pa.int8()),
                "h": pa.array([0], pa.int64()),
                "n_docs": pa.array([n_docs], pa.int64()),
                "n_grams": pa.array([0], pa.int64()),
                "n_fp": pa.array([0], pa.int64()),
            })
        parts = [tarr.take(pa.array(gidx + j, pa.int64())) for j in range(k)]
        grams = pc.binary_join_element_wise(*parts, " ")
        # the module's single md5_number_upper-parity hash kernel
        # (an inline copy drifted here before — code-review r05)
        g = _token_hashes_md5(grams)              # (m,) uint64 gram hashes

        gdoc = parent[gidx]                       # doc of each gram
        # gram position within its doc (docs are contiguous in flat order)
        starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
        doc_start_of = starts[np.searchsorted(starts, np.arange(m), side="right") - 1]
        gpos = np.arange(m) - doc_start_of
        if gpos.size and int(gpos.max()) >= _WIN_POS_CAP:
            raise AssertionError("winnow_fingerprints: doc exceeds the "
                                 "HUGEINT pack position cap (2^20 grams)")

        # per-window rightmost argmin over [max(doc_start, e-w+1), e]
        pad = np.full(w - 1, U64MAX, dtype=np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(
            np.concatenate([pad, g]), w).copy()   # (m, w): win[e, j] = g[e-w+1+j]
        offs = np.arange(-w + 1, 1)
        pos_mat = np.arange(m)[:, None] + offs[None, :]
        win[pos_mat < doc_start_of[:, None]] = U64MAX
        rev = win[:, ::-1]
        j_rev = np.argmin(rev, axis=1)            # first min in reversed = rightmost
        sel = np.arange(m) - j_rev                # selected flat gram index per window
        sel = np.unique(sel)
        n_fp = int(sel.size)
        fp_h = np.unique(g[sel])                  # distinct fingerprint hashes (batch)

        nd = fp_h.size
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(1, np.int64), np.ones(nd, np.int64)], pa.int8()),
            "h": pa.array(np.concatenate([[np.int64(0)], fp_h.view(np.int64)]), pa.int64()),
            "n_docs": pa.array(np.r_[np.int64(n_docs), np.zeros(nd, np.int64)], pa.int64()),
            "n_grams": pa.array(np.r_[np.int64(m), np.zeros(nd, np.int64)], pa.int64()),
            "n_fp": pa.array(np.r_[np.int64(n_fp), np.zeros(nd, np.int64)], pa.int64()),
        })

    def partials(b: pa.Table) -> pa.Table:
        kind = b["kind"].to_numpy(zero_copy_only=False)
        return pa.table({
            "nd_p": pa.array([int((kind == 1).sum())], pa.int64()),
            "docs_p": pa.array([int(pc.sum(b["n_docs"]).as_py() or 0)], pa.int64()),
            "grams_p": pa.array([int(pc.sum(b["n_grams"]).as_py() or 0)], pa.int64()),
            "fp_p": pa.array([int(pc.sum(b["n_fp"]).as_py() or 0)], pa.int64()),
        })

    tot = (
        ds.map_batches(fp_batch, batch_format="pyarrow")
        .groupby(["kind", "h"])
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_grams", alias_name="n_grams"),
                   Sum("n_fp", alias_name="n_fp"))
        .map_batches(partials, batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame({
        "n_docs": [np.int64(tot["docs_p"].sum())],
        "n_grams": [np.int64(tot["grams_p"].sum())],
        "n_fingerprints": [np.int64(tot["fp_p"].sum())],
        "n_distinct_fp": [np.int64(tot["nd_p"].sum())],
    })
