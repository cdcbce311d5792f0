"""Text-analysis operators for training-data pipelines: quality stats,
language-ID heuristic, token counting, document fingerprinting.

All are vectorized ``map_batches`` stages over Arrow batches; the ones
with DuckDB-expressible semantics keep an exact SQL twin in
``__ray_entry__.oracle_sql`` (keep in lockstep). Language-ID mirrors the
reference's char/marker-ratio approach (reference: src/ai_service/layers/
language/language_detection_service.py:119-360 — SURVEY.md §2.2 M3)
re-expressed as a deterministic marker-token count + argmax.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms


def round_half_away(x: np.ndarray, digits: int) -> np.ndarray:
    """Round half away from zero — DuckDB's ROUND semantics (numpy's
    ``round`` is half-to-even; the oracle comparison needs identical
    rounding on both sides)."""
    m = 10.0**digits
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m


def exact_cents(arr: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """The repo's single integer-cents kernel: ``sign·floor(|v|·100+0.5)``
    as int64 — half-AWAY-from-zero, matching DuckDB ``round(v*100)`` in
    every SQL twin. (Arrow's ``pc.round`` is half-to-even and would
    diverge on exact .5 boundaries, e.g. 3-decimal inputs.)"""
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.array((np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64))


# marker-token sets per language (deterministic, tiny; argmax with
# fixed tie order en < de < es < fr < ru — matches the SQL CASE chain)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "to", "of", "and"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "que", "es", "una"),
    "fr": ("le", "les", "des", "est", "une", "dans"),
    "ru": ("и", "в", "не", "на", "что", "это"),
}
LANG_ORDER = ("en", "de", "es", "fr", "ru")


def quality_stats(batch: pa.Table, cfg: AnalyzerConfig) -> pa.Table:
    """doc_id → n_tokens, n_uniq, n_chars, avg_token_len, uniq_ratio."""
    parent, terms = flat_terms(batch, cfg)
    n = batch.num_rows
    n_tokens = np.zeros(n, dtype=np.int64)
    sum_len = np.zeros(n, dtype=np.int64)
    if len(terms):
        lengths = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
        np.add.at(n_tokens, parent, 1)
        np.add.at(sum_len, parent, lengths)
    # distinct terms per doc via arrow group_by on deduped (d, t)
    n_uniq = np.zeros(n, dtype=np.int64)
    if len(terms):
        dd = pa.table({"d": pa.array(parent), "t": terms}).group_by(["d", "t"]).aggregate([])
        np.add.at(n_uniq, dd["d"].to_numpy(zero_copy_only=False), 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        avg_len = np.where(n_tokens > 0, sum_len / np.maximum(n_tokens, 1), 0.0)
        uniq_ratio = np.where(n_tokens > 0, n_uniq / np.maximum(n_tokens, 1), 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "n_uniq": pa.array(n_uniq),
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            "avg_token_len": pa.array(round_half_away(avg_len, 4)),
            "uniq_ratio": pa.array(round_half_away(uniq_ratio, 4)),
        }
    )


def langid(batch: pa.Table, cfg: AnalyzerConfig) -> pa.Table:
    """doc_id → pred_lang (marker-count argmax, tie → LANG_ORDER)."""
    parent, terms = flat_terms(batch, cfg)
    n = batch.num_rows
    counts = np.zeros((n, len(LANG_ORDER)), dtype=np.int64)
    if len(terms):
        t_np = terms.to_numpy(zero_copy_only=False)
        for li, lang in enumerate(LANG_ORDER):
            mask = np.isin(t_np, LANG_MARKERS[lang])
            np.add.at(counts[:, li], parent[mask], 1)
    best = counts.argmax(axis=1)  # first max wins = LANG_ORDER tie-break
    has_any = counts.max(axis=1) > 0
    langs = np.array(LANG_ORDER, dtype=object)
    pred = np.where(has_any, langs[best], "unknown")
    return pa.table({"doc_id": batch["doc_id"], "pred_lang": pa.array(pred.tolist(), pa.string())})


def fingerprint(batch: pa.Table, cfg: AnalyzerConfig, window: int = 4) -> pa.Table:
    """doc_id → winnowing-style fingerprint: min rolling hash over token
    ``window``-grams (Schleimer et al., "Winnowing: Local Algorithms for
    Document Fingerprinting", SIGMOD'03 — public algorithm). Used for
    cheap near-dup bucketing; not SQL-expressible (rows-only check)."""
    from hybrid_sanctions_search_engine_ray.stages.dedup import _gram_hashes, _token_hashes

    parent, terms = flat_terms(batch, cfg)
    n = batch.num_rows
    out = np.zeros(n, dtype=np.uint64)
    if len(terms):
        th = _token_hashes(terms.to_numpy(zero_copy_only=False))
        k = window
        if th.size >= k:
            grams_all = _gram_hashes(th, k)
            valid = parent[: grams_all.size] == parent[k - 1 : k - 1 + grams_all.size]
            grams, gdoc = grams_all[valid], parent[: grams_all.size][valid]
        else:
            grams = np.empty(0, dtype=np.uint64)
            gdoc = np.empty(0, dtype=np.int64)
        counts = np.bincount(parent, minlength=n)
        short = np.flatnonzero((counts > 0) & (counts < k))
        if short.size:
            sg = np.array([th[parent == d].min() for d in short], dtype=np.uint64)
            grams, gdoc = np.concatenate([grams, sg]), np.concatenate([gdoc, short])
            order = np.argsort(gdoc, kind="stable")
            grams, gdoc = grams[order], gdoc[order]
        if grams.size:
            starts = np.flatnonzero(np.concatenate(([True], gdoc[1:] != gdoc[:-1])))
            out[gdoc[starts]] = np.minimum.reduceat(grams, starts)
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(out.view(np.int64))}
    )


# BPE-style pretokenizer (the GPT-2 pattern's RE2-expressible core:
# contractions | letter runs | digit runs | punctuation runs — the
# whitespace-merge refinement needs lookahead, which RE2 lacks, so space
# runs are simply not counted as tokens). Shared verbatim with the
# driver's DuckDB oracle (both engines run RE2).
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)|[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]+"


def bpe_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``n_bpe_tokens``: the BPE-ish pretoken count per row — the
    standard LLM-pipeline budget metric, one vectorized Arrow
    ``count_substring_regex`` sweep per batch (null text counts 0)."""
    n = pc.count_substring_regex(pc.fill_null(batch[text_col], ""), BPE_TOKEN_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def repetition_stats(batch: pa.Table, cfg: AnalyzerConfig) -> pa.Table:
    """Gopher-style repetition quality signals per doc: token count,
    distinct-token count, duplicate-token fraction and duplicate-BIGRAM
    fraction (1 − distinct/total over adjacent word pairs — high values
    flag degenerate/boilerplate text). Vectorized: one analyzer sweep,
    shifted-array bigram join, pandas C-groupby nunique."""
    import pandas as pd

    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    parent, terms = flat_terms(batch, cfg)
    n = batch.num_rows
    n_tok = np.zeros(n, dtype=np.int64)
    n_dist = np.zeros(n, dtype=np.int64)
    n_bi = np.zeros(n, dtype=np.int64)
    n_bi_dist = np.zeros(n, dtype=np.int64)
    if len(terms):
        t = terms.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"d": parent, "t": t})
        g = df.groupby("d", sort=False)["t"].agg(["size", "nunique"])
        n_tok[g.index.to_numpy()] = g["size"].to_numpy()
        n_dist[g.index.to_numpy()] = g["nunique"].to_numpy()
        same = parent[1:] == parent[:-1]
        if same.any():
            big = pd.DataFrame(
                {
                    "d": parent[1:][same],
                    "g": np.char.add(np.char.add(t[:-1][same].astype(str), " "),
                                     t[1:][same].astype(str)),
                }
            )
            gb = big.groupby("d", sort=False)["g"].agg(["size", "nunique"])
            n_bi[gb.index.to_numpy()] = gb["size"].to_numpy()
            n_bi_dist[gb.index.to_numpy()] = gb["nunique"].to_numpy()
    with np.errstate(divide="ignore", invalid="ignore"):
        dup_tok = np.where(n_tok > 0, 1.0 - n_dist / np.maximum(n_tok, 1), 0.0)
        dup_bi = np.where(n_bi > 0, 1.0 - n_bi_dist / np.maximum(n_bi, 1), 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_distinct": pa.array(n_dist),
            "dup_token_frac": pa.array(dup_tok),
            "dup_bigram_frac": pa.array(dup_bi),
        }
    )


def chunk_documents(batch: pa.Table, cfg: AnalyzerConfig, window: int = 32,
                    stride: int = 24) -> pa.Table:
    """Token-window chunking with overlap — the RAG / training-sample
    prep step: each doc becomes ⌈(dl−window)/stride⌉+1 chunks of up to
    ``window`` tokens, consecutive chunks overlapping by
    ``window − stride`` (docs at most ``window`` long give one chunk;
    token-less docs give none). Fully vectorized: one analyzer sweep,
    one flat-token gather (np.repeat offset arithmetic) and one Arrow
    ``binary_join`` per batch — a pure flat-map that streams at any
    scale. Output rows: (doc_id, chunk_idx, n_tokens, chunk_text)."""
    if stride <= 0 or window < stride:
        raise ValueError("need 0 < stride <= window")
    parent, terms = flat_terms(batch, cfg)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int32()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )
    if parent.size == 0:
        return empty
    doc_tok_start = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
    counts = np.diff(np.r_[doc_tok_start, parent.size])
    rows_present = parent[doc_tok_start]  # batch row index per doc with >=1 token
    n_chunks = np.where(counts <= window, 1, (counts - window + stride - 1) // stride + 1)
    doc_rep = np.repeat(np.arange(rows_present.size), n_chunks)
    chunk_starts_cum = np.r_[0, np.cumsum(n_chunks)]
    chunk_idx = np.arange(doc_rep.size) - chunk_starts_cum[doc_rep]
    tok_start = chunk_idx * stride
    chunk_len = np.minimum(window, counts[doc_rep] - tok_start)
    offsets = np.r_[0, np.cumsum(chunk_len)]
    tok_idx = (
        np.repeat(doc_tok_start[doc_rep] + tok_start, chunk_len)
        + np.arange(offsets[-1])
        - np.repeat(offsets[:-1], chunk_len)
    )
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), terms.take(pa.array(tok_idx)))
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(ids[rows_present[doc_rep]], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int32()),
            "n_tokens": pa.array(chunk_len, pa.int64()),
            "chunk_text": pc.binary_join(lists, " "),
        }
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(batch: pa.Table, text_col: str = "text",
                 min_words: int = 5, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1, min_alpha_word_frac: float = 0.8,
                 min_stopwords: int = 2) -> pa.Table:
    """The Gopher quality-filter rules (Rae et al. 2021, table A1 —
    public paper), per document, fully vectorized:

    * word count in [min_words, max_words] (whitespace tokens);
    * mean word length (codepoints) in [min, max];
    * symbol-to-word ratio ≤ max: symbols = '#' chars + non-overlapping
      '...' occurrences;
    * fraction of words containing an ASCII letter ≥ min;
    * ≥ min_stopwords DISTINCT stopwords from the canonical 8-word list
      present (lowercased token equality).

    Emits the metrics AND per-rule booleans AND the conjunction
    ``keep`` so downstream filters stay explainable. One Arrow pass:
    list-split + flatten + bincount-by-parent — no per-row Python."""
    import pyarrow.compute as pc

    s = pc.fill_null(batch[text_col], "")
    trimmed = pc.utf8_trim_whitespace(s)
    toks = pc.split_pattern_regex(trimmed, pattern="\\s+")
    n_words = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    # empty text → [''] — count it as zero words
    first_empty = pc.equal(pc.list_element(toks, 0), "").to_numpy(zero_copy_only=False)
    n_words = np.where((n_words == 1) & first_empty, 0, n_words)
    flat = pc.list_flatten(toks)
    parents = np.repeat(np.arange(len(batch), dtype=np.int64),
                        pc.list_value_length(toks).to_numpy(zero_copy_only=False))
    n = len(batch)
    wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    sum_wl = np.bincount(parents, weights=wl, minlength=n)
    nw_safe = np.maximum(n_words, 1).astype(np.float64)
    mean_wl = sum_wl / nw_safe
    alpha = pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(zero_copy_only=False)
    alpha_frac = np.bincount(parents, weights=alpha.astype(np.float64), minlength=n) / nw_safe
    hashes = np.asarray([t.count("#") + t.count("...") for t in s.to_pylist()],
                        dtype=np.int64)  # tiny per-doc str.count, C-level
    symbol_ratio = hashes / nw_safe
    low = pc.utf8_lower(flat)
    sw_present = np.zeros(n, dtype=np.int64)
    for w in GOPHER_STOPWORDS:
        hit = pc.equal(low, w).to_numpy(zero_copy_only=False)
        sw_present += np.bincount(parents, weights=hit.astype(np.float64),
                                  minlength=n).astype(bool).astype(np.int64)
    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mwl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    r_sym = symbol_ratio <= max_symbol_ratio
    r_alpha = alpha_frac >= min_alpha_word_frac
    r_sw = sw_present >= min_stopwords
    keep = r_words & r_mwl & r_sym & r_alpha & r_sw
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(n_words),
        "mean_word_len": pa.array(round_half_away(mean_wl, 4)),
        "symbol_ratio": pa.array(round_half_away(symbol_ratio, 4)),
        "alpha_word_frac": pa.array(round_half_away(alpha_frac, 4)),
        "n_stopwords_present": pa.array(sw_present),
        "pass_words": pa.array(r_words), "pass_mean_len": pa.array(r_mwl),
        "pass_symbols": pa.array(r_sym), "pass_alpha": pa.array(r_alpha),
        "pass_stopwords": pa.array(r_sw), "keep": pa.array(keep),
    })


def mlm_mask_stats(batch: pa.Table, rate_pct: int = 15,
                   text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Deterministic MLM masking-plan construction (BERT-style
    pre-training example prep): token (doc, pos) is masked iff
    ``hash(doc_id·2²⁰ + pos) mod 100 < rate_pct`` where hash is the
    splitmix64 wrap-mix (multiply-add mod 2⁶⁴ — the embed_exact device,
    SQL-replicable in UHUGEINT without xor-shifts). Retry/resume-stable:
    the mask is a pure function of (doc_id, pos), independent of
    batching and cluster size.

    Emits one row per non-empty doc straight from its batch — no
    exchange at all: (doc_id, n_tokens, n_masked, mask_pos_sum,
    masked_chars). The position-sum and char-sum act as value
    checksums of the mask plan."""
    from hybrid_sanctions_search_engine_ray.stages.analyze import (
        _SIMPLE_RE2,
        _lower_nfc,
    )

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    tokens = pc.split_pattern_regex(_lower_nfc(text), _SIMPLE_RE2)
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens)
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat = flat.filter(keep)
    parent_np = parent.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
    if parent_np.size == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "n_masked": pa.array([], pa.int64()),
            "mask_pos_sum": pa.array([], pa.int64()),
            "masked_chars": pa.array([], pa.int64()),
        })
    n = parent_np.size
    seg_start = np.r_[0, np.flatnonzero(np.diff(parent_np)) + 1]
    seg_len = np.diff(np.r_[seg_start, n])
    pos = np.arange(n, dtype=np.int64) - np.repeat(seg_start, seg_len)
    if int(pos.max()) >= (1 << 20):
        raise ValueError("document exceeds 2^20 token positions — raise the "
                         "mask-key shift (input cap is far below this)")
    key = (ids[parent_np].astype(np.uint64) << np.uint64(20)) + pos.astype(np.uint64)
    h = key * np.uint64(11400714819323198485) + np.uint64(9172280023384029625)
    masked = (h % np.uint64(100)) < np.uint64(rate_pct)
    tlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    docs_here = np.unique(parent_np)
    minl = int(parent_np.max()) + 1
    return pa.table({
        "doc_id": pa.array(ids[docs_here], pa.int64()),
        "n_tokens": pa.array(np.bincount(parent_np, minlength=minl)[docs_here], pa.int64()),
        "n_masked": pa.array(np.bincount(parent_np, weights=masked, minlength=minl)[docs_here].astype(np.int64)),
        "mask_pos_sum": pa.array(np.bincount(parent_np, weights=pos * masked, minlength=minl)[docs_here].astype(np.int64)),
        "masked_chars": pa.array(np.bincount(parent_np, weights=tlen * masked, minlength=minl)[docs_here].astype(np.int64)),
    })


def compression_stats(batch: pa.Table, level: int = 6,
                      text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Compression-ratio quality signal (CCNet/Dolma-style redundancy
    proxy: highly repetitive boilerplate compresses far below prose):
    per-doc ``deflate_bytes / utf8_bytes`` at a fixed zlib level. The
    compressor is per-row C code (stdlib zlib) — the one stage in the
    quality family whose kernel cannot be Arrow-vectorized; it stays a
    streaming map with no exchange, and the ratio is deterministic for
    a given zlib version (pinned by the container)."""
    import zlib

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    raw = [(v or "").encode("utf-8") for v in text.to_pylist()]
    comp = np.array([len(zlib.compress(b, level)) for b in raw], dtype=np.int64)
    size = np.array([len(b) for b in raw], dtype=np.int64)
    ratio = np.where(size > 0, comp / np.maximum(size, 1), 1.0)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "utf8_bytes": pa.array(size, pa.int64()),
        "deflate_bytes": pa.array(comp, pa.int64()),
        "compression_ratio": pa.array(np.round(ratio, 6), pa.float64()),
    })


def ngram_diversity(ds, key_col: str, cfg=None, n: int = 3):
    """Corpus lexical-diversity profile per ``key_col`` (the
    dedup/curation-effectiveness signal a training-data pipeline tracks
    next to its quality filters): per key the token count, distinct
    token count (types), type-token ratio, within-doc word ``n``-gram
    count, distinct ``n``-gram count and the n-gram diversity ratio
    (distinct/total — 1.0 means no repeated n-gram anywhere).

    Scale shape: one streaming tokenize pass emits (a) per-batch
    (key, token/gram totals) partial sums — keys-sized — and (b)
    per-batch DISTINCT (key, gram) / (key, term) pairs; the ONE real
    exchange carries those distinct pairs (the same phrase-pair pattern
    as fuzzy_ratios), then a per-key count. Raw rows never shuffle.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    cfg = cfg or AnalyzerConfig()

    def pairs(b: pa.Table) -> pa.Table:
        parent, terms = flat_terms(b, cfg)
        keys = b[key_col].to_pandas().to_numpy(dtype=object)
        t = terms.to_numpy(zero_copy_only=False).astype(object)
        k = keys[parent]
        # within-doc n-grams: shifted join, doc-boundary masked
        if t.size >= n:
            mask = np.ones(t.size - (n - 1), dtype=bool)
            for i in range(1, n):
                mask &= parent[: t.size - (n - 1)] == parent[i: t.size - (n - 1) + i]
            gram = t[: t.size - (n - 1)].astype(str)
            for i in range(1, n):
                gram = np.char.add(np.char.add(gram, " "),
                                   t[i: t.size - (n - 1) + i].astype(str))
            gk, gv = k[: t.size - (n - 1)][mask], gram[mask]
        else:
            gk = np.array([], dtype=object)
            gv = np.array([], dtype=object)
        uni = pd.DataFrame({"key": k, "item": t}).drop_duplicates()
        tri = pd.DataFrame({"key": gk, "item": gv}).drop_duplicates()
        uni["kind"], tri["kind"] = "t", "g"
        both = pd.concat([uni, tri], ignore_index=True)
        return pa.Table.from_pandas(both, preserve_index=False)

    def totals(b: pa.Table) -> pa.Table:
        parent, terms = flat_terms(b, cfg)
        keys = b[key_col].to_pandas().to_numpy(dtype=object)
        k = keys[parent]
        cnt = pd.DataFrame({"key": k}).groupby("key", sort=False).size()
        if parent.size >= n:
            mask = np.ones(parent.size - (n - 1), dtype=bool)
            for i in range(1, n):
                mask &= parent[: parent.size - (n - 1)] == parent[i: parent.size - (n - 1) + i]
            gcnt = pd.DataFrame({"key": k[: parent.size - (n - 1)][mask]}) \
                .groupby("key", sort=False).size()
        else:
            gcnt = pd.Series(dtype=np.int64)
        out = pd.DataFrame({"key": cnt.index, "tok_p": cnt.to_numpy(dtype=np.int64)})
        out["gram_p"] = gcnt.reindex(cnt.index).fillna(0).to_numpy(dtype=np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    tot = (
        ds.map_batches(totals, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("tok_p", alias_name="n_tokens"),
                   Sum("gram_p", alias_name="n_grams"))
        .to_pandas()
    )

    from ray.data.aggregate import Count

    def dcount_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"key": b["key"].to_pandas(),
                           "kind": b["kind"].to_pandas()})
        g = df.groupby(["key", "kind"], sort=False).size().reset_index(name="c_p")
        g["c_p"] = g["c_p"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    dist = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["key", "kind", "item"])
        .aggregate(Count(alias_name="_n"))           # unique triples
        .map_batches(dcount_partial, batch_format="pyarrow")
        .groupby(["key", "kind"])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
    )
    types = dist[dist["kind"] == "t"].set_index("key")["c"] if not dist.empty else pd.Series(dtype=np.int64)
    dgrams = dist[dist["kind"] == "g"].set_index("key")["c"] if not dist.empty else pd.Series(dtype=np.int64)
    if tot.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "n_tokens": pd.Series([], dtype=np.int64),
                             "n_types": pd.Series([], dtype=np.int64),
                             "ttr": pd.Series([], dtype=float),
                             "n_grams": pd.Series([], dtype=np.int64),
                             "n_distinct_grams": pd.Series([], dtype=np.int64),
                             "gram_diversity": pd.Series([], dtype=float)})
    tot = tot.sort_values("key", kind="mergesort").reset_index(drop=True)
    n_types = types.reindex(tot["key"]).fillna(0).to_numpy(dtype=np.int64)
    n_dg = dgrams.reindex(tot["key"]).fillna(0).to_numpy(dtype=np.int64)
    n_tok = tot["n_tokens"].to_numpy(dtype=np.int64)
    n_gr = tot["n_grams"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        key_col: tot["key"],
        "n_tokens": n_tok,
        "n_types": n_types,
        "ttr": round_half_away(n_types / np.maximum(n_tok, 1), 4),
        "n_grams": n_gr,
        "n_distinct_grams": n_dg,
        "gram_diversity": round_half_away(
            np.where(n_gr > 0, n_dg / np.maximum(n_gr, 1), 1.0), 4),
    })


def fim_split(batch: pa.Table, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """Fill-in-the-middle transform (Bavarian et al. 2022, the code-LM
    pretraining augmentation): split each document at two deterministic
    character positions and emit the PSM rendering
    ``<PRE>prefix<SUF>suffix<MID>middle``.

    Split points derive from the doc id, NOT a RNG — retry/batching
    invariant and exactly SQL-twinnable: with
    ``h = md5_number_upper(cast(doc_id AS varchar))`` (the repo-wide
    DuckDB-parity 64-bit hash) and ``L = length(text)`` in characters,

    - ``a = h % (L + 1)``                        (prefix end, 0..L)
    - ``b = a + (h // (L + 1)) % (L − a + 1)``   (middle end, a..L)

    Zero-exchange pure map stage. The 3-way character slicing is a
    per-row Python loop over the batch (string surgery has no Arrow
    kernel with per-row offsets); at 3 slices/doc it is allocation-bound
    and far off any hot path — the md5 is computed once per row, not per
    char.
    """
    import hashlib

    text = batch[text_col].to_pandas().to_numpy(dtype=object)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    n = len(text)
    pre = np.empty(n, dtype=object)
    mid = np.empty(n, dtype=object)
    suf = np.empty(n, dtype=object)
    a_out = np.empty(n, dtype=np.int64)
    b_out = np.empty(n, dtype=np.int64)
    for i in range(n):
        s = text[i] or ""
        h = int.from_bytes(hashlib.md5(str(ids[i]).encode()).digest()[:8], "little")
        L = len(s)
        a = h % (L + 1)
        b = a + (h // (L + 1)) % (L - a + 1)
        pre[i], mid[i], suf[i] = s[:a], s[a:b], s[b:]
        a_out[i], b_out[i] = a, b
    fim = pc.binary_join_element_wise(
        pa.array(["<PRE>"] * n, pa.string()), pa.array(pre, pa.string()),
        pa.array(["<SUF>"] * n, pa.string()), pa.array(suf, pa.string()),
        pa.array(["<MID>"] * n, pa.string()), pa.array(mid, pa.string()),
        "",
    )
    return pa.table({
        id_col: batch[id_col],
        "a": pa.array(a_out, pa.int64()),
        "b": pa.array(b_out, pa.int64()),
        "fim_text": fim,
    })


def term_dispersion(ds, cfg: AnalyzerConfig | None = None,
                    min_df: int = 50, top_n: int = 20):
    """Term burstiness: the index of dispersion (population variance /
    mean) of a term's per-document tf, over the documents containing it
    — Church & Gale's burstiness signal separating topical terms
    (bursty: a doc that mentions them mentions them often) from
    function words (evenly sprinkled). With integer sufficient
    statistics ``df, s1 = Σtf, s2 = Σtf²``:

        D = (df·s2 − s1²) / (df·s1)      (round4)

    One tokenize scan → per-batch (term, df/s1/s2) partials (per-doc tf
    is in-batch: a document's tokens never split) → ONE vocab-sized
    3-sum groupby; top-``top_n`` by (D desc, term) among df ≥ min_df.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    cfg = cfg or AnalyzerConfig()

    def partial(b: pa.Table) -> pa.Table:
        parent, terms = flat_terms(b, cfg)
        empty = pa.table({"term": pa.array([], pa.string()),
                          "df_p": pa.array([], pa.int64()),
                          "s1_p": pa.array([], pa.int64()),
                          "s2_p": pa.array([], pa.int64())})
        if parent.size == 0:
            return empty
        t = pa.table({"d": pa.array(parent), "term": terms})
        g = t.group_by(["d", "term"]).aggregate([([], "count_all")])
        tf = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        t2 = pa.table({"term": g["term"], "one": pa.array(np.ones(len(g), np.int64)),
                       "s1": pa.array(tf), "s2": pa.array(tf * tf)})
        gg = t2.group_by("term").aggregate([("one", "sum"), ("s1", "sum"), ("s2", "sum")])
        return pa.table({"term": gg["term"],
                         "df_p": gg["one_sum"].cast(pa.int64()),
                         "s1_p": gg["s1_sum"].cast(pa.int64()),
                         "s2_p": gg["s2_sum"].cast(pa.int64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"),
                   Sum("s1_p", alias_name="s1"),
                   Sum("s2_p", alias_name="s2"))
        .to_pandas()
    )
    if "df" not in agg.columns:  # empty Dataset loses columns on to_pandas
        agg = pd.DataFrame({"term": pd.Series([], dtype=object),
                            "df": pd.Series([], dtype=np.int64),
                            "s1": pd.Series([], dtype=np.int64),
                            "s2": pd.Series([], dtype=np.int64)})
    agg = agg[agg["df"] >= min_df].copy()
    df_ = agg["df"].to_numpy(np.int64).astype(np.float64)
    s1 = agg["s1"].to_numpy(np.int64).astype(np.float64)
    s2 = agg["s2"].to_numpy(np.int64).astype(np.float64)
    d = (df_ * s2 - s1 * s1) / (df_ * s1)
    agg["dispersion"] = np.sign(d) * np.floor(np.abs(d) * 1e4 + 0.5) / 1e4
    agg["df"] = agg["df"].astype(np.int64)
    agg["s1"] = agg["s1"].astype(np.int64)
    out = agg.sort_values(["dispersion", "term"], ascending=[False, True],
                          kind="mergesort").head(top_n)
    return out[["term", "df", "s1", "dispersion"]].reset_index(drop=True)


def vocab_gini(ds, cfg: AnalyzerConfig | None = None):
    """Gini coefficient of the corpus term-frequency distribution — the
    inequality summary of Zipfian skew (0 = uniform vocabulary use,
    →1 = a few stop words carry everything): with counts c_(1) ≤ … ≤
    c_(n), ``G = 2·Σ i·c_(i) / (n·Σc) − (n+1)/n``. Tie order cannot
    change the sum (equal values × a fixed position block), so the
    statistic is deterministic. One tokenize scan → vocab-sized count
    exchange → driver sort of the (small) vocabulary."""
    import pandas as pd
    from ray.data.aggregate import Sum

    cfg = cfg or AnalyzerConfig()

    def partial(b: pa.Table) -> pa.Table:
        _parent, terms = flat_terms(b, cfg)
        if len(terms) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        g = pa.table({"term": terms}).group_by("term").aggregate([([], "count_all")])
        return pa.table({"term": g["term"], "c_p": g["count_all"].cast(pa.int64())})

    cf = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby("term").aggregate(Sum("c_p", alias_name="c")).to_pandas())
    if "c" not in cf.columns:  # empty Dataset loses columns on to_pandas
        cf = pd.DataFrame({"term": pd.Series([], dtype=object),
                           "c": pd.Series([], dtype=np.int64)})
    cf = cf.sort_values(["c", "term"], kind="mergesort").reset_index(drop=True)
    c = cf["c"].to_numpy(np.int64)
    n = c.size
    tot = int(c.sum())
    if n == 0 or tot == 0:
        g = 0.0
    else:
        i = np.arange(1, n + 1, dtype=np.float64)
        g = 2.0 * float((i * c).sum()) / (n * tot) - (n + 1.0) / n
    g = float(np.sign(g) * np.floor(abs(g) * 1e4 + 0.5) / 1e4)
    return pd.DataFrame({"n_terms": [np.int64(n)],
                         "total_tokens": [np.int64(tot)],
                         "gini": [g]})


def zipf_fit(ds, cfg: AnalyzerConfig | None = None, min_count: int = 5):
    """Zipf-law fit: OLS slope/intercept of ln(count) on ln(rank) over
    terms with count ≥ min_count (rank by count desc, term) — the
    corpus-health diagnostic (natural text sits near slope −1; synthetic
    or templated corpora deviate). Closed-form OLS with the identical
    moment formula on both engines; one vocab-sized count exchange."""
    import pandas as pd
    from ray.data.aggregate import Sum

    cfg = cfg or AnalyzerConfig()

    def partial(b: pa.Table) -> pa.Table:
        _parent, terms = flat_terms(b, cfg)
        if len(terms) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        g = pa.table({"term": terms}).group_by("term").aggregate([([], "count_all")])
        return pa.table({"term": g["term"], "c_p": g["count_all"].cast(pa.int64())})

    cf = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby("term").aggregate(Sum("c_p", alias_name="c")).to_pandas())
    if "c" not in cf.columns:  # empty Dataset loses columns on to_pandas
        cf = pd.DataFrame({"term": pd.Series([], dtype=object),
                           "c": pd.Series([], dtype=np.int64)})
    cf = cf[cf["c"] >= min_count]
    cf = cf.sort_values(["c", "term"], ascending=[False, True],
                        kind="mergesort").reset_index(drop=True)
    n = len(cf)
    r4 = lambda x: float(np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4)  # noqa: E731
    if n < 2:
        return pd.DataFrame({"n_points": [np.int64(n)], "slope": [0.0],
                             "intercept": [0.0]})
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(cf["c"].to_numpy(np.int64).astype(np.float64))
    sx, sy = x.sum(), y.sum()
    sxy, sxx = (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame({"n_points": [np.int64(n)],
                         "slope": [r4(slope)], "intercept": [r4(intercept)]})


def vocab_entropy(ds, cfg: AnalyzerConfig | None = None):
    """Shannon entropy (bits) + perplexity of the unigram term
    distribution — the diversity summary beside the Gini/Zipf pair."""
    import pandas as pd
    from ray.data.aggregate import Sum

    cfg = cfg or AnalyzerConfig()

    def partial(b: pa.Table) -> pa.Table:
        _parent, terms = flat_terms(b, cfg)
        if len(terms) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        g = pa.table({"term": terms}).group_by("term").aggregate([([], "count_all")])
        return pa.table({"term": g["term"], "c_p": g["count_all"].cast(pa.int64())})

    cf = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby("term").aggregate(Sum("c_p", alias_name="c")).to_pandas())
    if "c" not in cf.columns:  # empty Dataset loses columns on to_pandas
        cf = pd.DataFrame({"term": pd.Series([], dtype=object),
                           "c": pd.Series([], dtype=np.int64)})
    c = cf["c"].to_numpy(np.int64).astype(np.float64)
    tot = c.sum()
    r4 = lambda x: float(np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4)  # noqa: E731
    if tot == 0:
        return pd.DataFrame({"n_terms": [np.int64(0)], "entropy_bits": [0.0],
                             "perplexity": [0.0]})
    p = c / tot
    h = float(-(p * np.log2(p)).sum())
    return pd.DataFrame({"n_terms": [np.int64(len(c))],
                         "entropy_bits": [r4(h)],
                         "perplexity": [r4(2.0 ** h)]})


def dictionary_match(ds, patterns: list[str], text_col: str = "text"):
    """Multi-pattern exact substring matching — the engine-side analog
    of the reference's Aho–Corasick screening tier (reference:
    layers/patterns/high_recall_ac_generator.py generates the pattern
    payloads; the ES side matches them): count per pattern how many
    docs contain it and the total (non-overlapping, left-to-right)
    occurrence count.

    Per batch it runs ONE Arrow ``count_substring`` kernel per pattern
    (C-vectorized across the whole batch — no per-doc Python), emitting
    P partial rows; the only exchange is the P-row pattern-keyed
    groupby. This kernel-per-pattern shape is the right one up to
    ~10³ patterns (each pass is a memchr-class scan); beyond that an
    automaton actor (one pass per batch regardless of P) wins — the
    documented swap point. Occurrence counting is non-overlapping,
    matching the SQL replace-trick twin exactly."""
    from ray.data.aggregate import Sum

    pats = list(patterns)

    def partial(b: pa.Table) -> pa.Table:
        text = b[text_col]
        occ_out, doc_out = [], []
        for p in pats:
            c = pc.count_substring(text, pattern=p)
            occ_out.append(int(pc.sum(c).as_py() or 0))
            doc_out.append(int(pc.sum(pc.cast(pc.greater(c, 0), pa.int64())).as_py() or 0))
        return pa.table({"pattern": pa.array(pats, pa.string()),
                         "nd_p": pa.array(doc_out, pa.int64()),
                         "no_p": pa.array(occ_out, pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("pattern")
            .aggregate(Sum("nd_p", alias_name="n_docs"),
                       Sum("no_p", alias_name="n_occ")))


def readability_scores(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Flesch–Kincaid grade level per document (Kincaid et al. 1975 —
    the readability feature of the classic quality-filter panels):

        fk = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59

    with regex-defined counts — words = ``\\S+`` runs, sentences =
    ``[.!?]+`` runs (min 1), syllables approximated as vowel-group
    (``[aeiouy]+``, case-insensitive) runs (min 1) — the standard
    heuristic syllabifier. Pure map stage, zero exchanges; all three
    counts are ONE Arrow ``count_substring_regex`` kernel each
    (RE2-parity with DuckDB ``regexp_extract_all``), the grade mirrors
    the SQL float expression association-for-association then round4.
    Returns (doc_id, n_words, n_sentences, n_syllables, fk_grade)."""

    def score(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b[text_col], "")  # null text must not NaN-poison
        # the int casts (code-review r05 finding)
        w = pc.count_substring_regex(t, pattern=r"\S+").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s = pc.count_substring_regex(t, pattern=r"[.!?]+").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        y = pc.count_substring_regex(t, pattern=r"[aeiouyAEIOUY]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        wf = np.maximum(w, 1).astype(np.float64)
        sf = np.maximum(s, 1).astype(np.float64)
        yf = np.maximum(y, 1).astype(np.float64)
        fk = 0.39 * (wf / sf) + 11.8 * (yf / wf) - 15.59
        fk = np.sign(fk) * np.floor(np.abs(fk) * 1e4 + 0.5) / 1e4
        return pa.table({
            "doc_id": b[id_col],
            "n_words": pa.array(w, pa.int64()),
            "n_sentences": pa.array(s, pa.int64()),
            "n_syllables": pa.array(y, pa.int64()),
            "fk_grade": pa.array(fk, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
