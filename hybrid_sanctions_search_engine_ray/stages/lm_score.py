"""Bigram language-model fluency scoring (training-data curation).

Per-document average negative log-likelihood under an add-k-smoothed
word-bigram model estimated on the corpus itself — the classic
cheap-LM quality signal training-data pipelines use to rank/filter text
(n-gram-LM perplexity filtering à la CCNet/KenLM; here a self-trained
bigram model, no external LM exists in this environment).

    P(w2 | w1) = (c(w1, w2) + k) / (cf(w1) + k·V)
    nll(doc)  = -avg over the doc's bigram positions of ln P

``cf(w1)`` is the corpus frequency of w1 (ALL occurrences, including
doc-final ones — a deliberate, SQL-twin-matched simplification of the
context count), ``V`` the unigram vocabulary size.

Scale shape — no corpus-sized driver state, no unbounded broadcast:

1. Unigram pass: per-batch partial term counts → tiny
   ``groupby(term).sum`` → the UNIGRAM table (vocabulary-sized, the same
   broadcastability assumption the BM25 df path makes) is ``ray.put``
   once.
2. Bigram pass: per-batch (w1, w2, doc_id, n) partial counts (Arrow
   hash-group_by) → ``groupby(space)`` where ``space = hash(w1,w2) % 256``
   co-locates every occurrence of a bigram while keeping the group count
   FIXED (one vectorized scorer call per partition, not one Python call
   per bigram); global bigram counts are an in-partition
   groupby-transform sum — no join.
3. ``groupby(doc_id).sum`` folds contributions into one score per doc.

The two shuffles move bigram-count rows (≤ token count, heavily shrunk
by the map-side combine), never document text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum

from hybrid_sanctions_search_engine_ray.stages.analyze import _SIMPLE_RE2, _lower_nfc
from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away


def _batch_bigrams(batch: pa.Table) -> pa.Table:
    """Batch → (w1, w2, doc_id, n) within-document bigram counts."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    tokens = pc.split_pattern_regex(_lower_nfc(text), _SIMPLE_RE2)
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens)
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat = flat.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    p = parent.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.table(
        {
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )
    if p.size < 2:
        return empty
    idx = np.flatnonzero(p[:-1] == p[1:])  # adjacent tokens in the same doc
    if idx.size == 0:
        return empty
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    occ = pa.table(
        {
            "w1": flat.take(pa.array(idx)),
            "w2": flat.take(pa.array(idx + 1)),
            "doc_id": pa.array(doc_ids[p[idx]], pa.int64()),
        }
    )
    g = occ.group_by(["w1", "w2", "doc_id"]).aggregate([([], "count_all")])
    return g.rename_columns(["w1", "w2", "doc_id", "n"]).set_column(
        3, "n", g["count_all"].cast(pa.int64())
    )


def unigram_counts(ds) -> pd.DataFrame:
    """Corpus term frequencies (term, cf) — partial counts per batch,
    one vocabulary-sized groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tokens = pc.split_pattern_regex(_lower_nfc(text), _SIMPLE_RE2)
        flat = pc.list_flatten(tokens)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        g = pa.table({"term": flat}).group_by(["term"]).aggregate([([], "count_all")])
        return pa.table({"term": g["term"], "cf_part": g["count_all"].cast(pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("term").sum("cf_part")
    return out.to_pandas().rename(columns={"sum(cf_part)": "cf"})


_SPACE_PARTITIONS = 256


def _add_space(b: pa.Table) -> pa.Table:
    """Coarsen the (w1, w2) shuffle key into a fixed partition count —
    one vectorized group per partition instead of one Python call per
    bigram (the same coarsening trick as the LSH pair stage). A bigram
    never straddles partitions, so in-partition sums are global sums."""
    key = pc.binary_join_element_wise(b["w1"], b["w2"], pa.scalar("\x1f", pa.string()))
    h = pd.util.hash_pandas_object(key.to_pandas(), index=False).to_numpy()  # stable uint64
    return b.append_column("space", pa.array((h % _SPACE_PARTITIONS).astype(np.int32)))


def _make_space_scorer(cu_ref, v: int, k: float):
    """Per-space scorer: all bigrams of one space partition scored in one
    vectorized pass. The broadcast unigram table is fetched from the
    LOCAL object store once per worker deserialization (never shipped
    inside the pickled closure)."""
    cache: dict[str, dict] = {}

    def score(g: pd.DataFrame) -> pd.DataFrame:
        if "cu" not in cache:
            cache["cu"] = ray.get(cu_ref)
        c_big = g.groupby(["w1", "w2"], sort=False)["n"].transform("sum").to_numpy(np.int64)
        c_uni = g["w1"].map(cache["cu"]).to_numpy(np.float64)
        n = g["n"].to_numpy(np.int64)
        logp = np.log((c_big + k) / (c_uni + k * v))
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "sum_logp": n.astype(np.float64) * logp,
                "n_pos": n,
            }
        )

    return score


def lm_score(ds, k: float = 0.5, concurrency: int = 4, round_digits: int = 4):
    """Dataset(doc_id, text) → Dataset(doc_id, n_bigrams, nll).

    Documents with fewer than two tokens emit no bigram and are absent
    from the output (matching the SQL twin's inner joins)."""
    cu_df = unigram_counts(ds)
    v = len(cu_df)
    cu_ref = ray.put(dict(zip(cu_df["term"], cu_df["cf"].astype(np.int64))))

    contrib = (
        ds.map_batches(_batch_bigrams, batch_format="pyarrow")
        .map_batches(_add_space, batch_format="pyarrow")
        .groupby("space")
        # concurrency was accepted but never used (code-review r05)
        .map_groups(_make_space_scorer(cu_ref, v, k), batch_format="pandas",
                    concurrency=concurrency)
    )
    agg = contrib.groupby("doc_id").aggregate(Sum("sum_logp"), Sum("n_pos"))

    def _finish(b: pd.DataFrame) -> pd.DataFrame:
        nll = -(b["sum(sum_logp)"].to_numpy(np.float64) / b["sum(n_pos)"].to_numpy(np.float64))
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype(np.int64),
                "n_bigrams": b["sum(n_pos)"].astype(np.int64),
                "nll": round_half_away(nll, round_digits),
            }
        )

    return agg.map_batches(_finish, batch_format="pandas")


def ccnet_buckets(ds, lang_ds, k: float = 0.5, n_buckets: int = 3,
                  num_partitions: int = 8):
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, arXiv:1911.00359 — the head/middle/tail split LLM corpora
    inherit from CCNet): score every document with the self-trained
    bigram LM, then cut each language's nll distribution at exact
    discrete quantile thresholds and label docs head/middle/.../tail.

    CCNet's published method is THRESHOLD-based (all docs at or below
    the per-language 33rd/66th-percentile perplexity go to head/middle),
    not ntile-based — ties share a bucket, which is also what makes the
    assignment deterministic and batching-invariant. Cutoff i is the
    smallest rounded-nll value whose cumulative count reaches
    ``ceil(i·n/n_buckets)`` (DuckDB ``quantile_disc`` semantics over the
    ×10⁴ integer cents).

    Scale shape: one narrow hash join (doc_id → lang; both sides are
    two-column), one bounded (lang × distinct-cent) histogram shuffle —
    cutoffs are a langs×(n_buckets−1) table broadcast back implicitly
    through the driver (tiny) — and one streaming labelling pass.
    Documents with <2 tokens have no LM score and are absent, matching
    the SQL twin's inner joins.
    """
    scored = lm_score(ds, k=k)
    # (doc_id, lang, nll) is doc-count-sized, and BOTH the histogram and
    # the labelling pass consume it — materialize once or the whole
    # lm_score pipeline (corpus scan + two bigram shuffles) re-executes
    # for the second pass (code-review r05 finding; the same pattern
    # pack_conversations uses)
    joined = scored.join(lang_ds, join_type="inner",
                         num_partitions=num_partitions,
                         on=("doc_id",)).materialize()

    def hist_partial(b: pa.Table) -> pa.Table:
        cents = round_half_away(
            b["nll"].to_numpy(zero_copy_only=False) * 1e4, 0).astype(np.int64)
        df = (pd.DataFrame({"lang": b["lang"].to_pylist(), "cent": cents})
              .groupby(["lang", "cent"], sort=False).size().reset_index(name="c_p"))
        return pa.Table.from_pandas(df, preserve_index=False)

    hist = (
        joined.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang", "cent"])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
        .sort_values(["lang", "cent"], kind="mergesort")
    )
    cuts: dict[str, np.ndarray] = {}
    names = (["head", "middle", "tail"] if n_buckets == 3
             else [f"b{i}" for i in range(n_buckets)])
    for lang, g in hist.groupby("lang", sort=False):
        cum = g["c"].to_numpy().cumsum()
        n = int(cum[-1])
        cents = g["cent"].to_numpy()
        # cutoff i = smallest cent with cum >= ceil(i*n/n_buckets)
        targets = [-(-i * n // n_buckets) for i in range(1, n_buckets)]
        cuts[lang] = cents[np.searchsorted(cum, targets, side="left")]

    import ray as _ray
    cuts_ref = _ray.put((cuts, names))

    def label(b: pa.Table) -> pa.Table:
        cts, nms = _ray.get(cuts_ref)
        langs = np.asarray(b["lang"].to_pylist(), dtype=object)
        cents = round_half_away(
            b["nll"].to_numpy(zero_copy_only=False) * 1e4, 0).astype(np.int64)
        bucket = np.empty(len(langs), dtype=object)
        for lang in np.unique(langs):
            m = langs == lang
            bucket[m] = np.asarray(nms, dtype=object)[
                np.searchsorted(cts[lang], cents[m], side="left")]
        return pa.table({
            "doc_id": b["doc_id"],
            "lang": b["lang"],
            "nll": b["nll"],
            "bucket": pa.array(bucket.tolist(), pa.string()),
        })

    return joined.map_batches(label, batch_format="pyarrow")
