"""Offline index build — the Ray-Data re-expression of the reference's
deployment pipeline (reference: scripts/prepare_sanctions_data.py +
scripts/deploy_to_elasticsearch.py — SURVEY.md §3.1), re-architected as:

    read_parquet → [assign stable doc ids] →
    Pass A: map_batches(term-stats partials) → groupby(term).sum
            → dictionary.parquet + corpus stats + hot-term set
    Pass B: map_batches(posting emit) → assign part (salted) →
            [resume filter] → groupby(part).map_groups(segment builder)
            → segments/part=K/* (atomic)  → manifest.json (finalized last)

Input text is tokenized twice (once per pass) — both passes stream with
backpressure and never materialize the corpus; the alternative (caching
an analyzed intermediate) trades ~1 corpus write for the second
tokenize and is strictly optional at any scale because tokenization is
vectorized C++ in simple mode.
"""

from __future__ import annotations

import os
from dataclasses import asdict

import numpy as np
import pyarrow as pa

import ray

from hybrid_sanctions_search_engine_ray.config import DEFAULT_CONFIG, EngineConfig
from hybrid_sanctions_search_engine_ray.stages.analyze import DOC_SENTINEL, emit_postings, emit_term_stats
from hybrid_sanctions_search_engine_ray.stages.postings import assign_partitions, build_segment
from hybrid_sanctions_search_engine_ray.state.manifest import IndexManifest, completed_parts


def assign_doc_ids(ds, sort: bool = True):
    """Assign dense, deterministic doc ids = rank under stable
    ``(conv_id, turn_idx)`` ordering (the north rule's T5 invariant,
    SURVEY.md §2.6).

    Implementation: range-shuffle sort, then per-block prefix-sum offsets
    (block row counts gathered via lightweight remote tasks, ids attached
    block-parallel). The sorted+id'd dataset is returned materialized —
    at 100 TB this runs once per corpus and the result is the persisted
    docmap; both passes read from it.
    """
    import ray.data as rd

    if sort:
        ds = ds.sort(["conv_id", "turn_idx"])
    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _count(block: pa.Table) -> int:
        return block.num_rows

    @ray.remote
    def _with_ids(block: pa.Table, offset: int) -> pa.Table:
        ids = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.int64))
        if "doc_id" in block.column_names:
            block = block.drop_columns(["doc_id"])
        return block.append_column("doc_id", ids)

    counts = ray.get([_count.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    new_refs = [_with_ids.remote(r, int(off)) for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(new_refs)


def build_dictionary(ds, index_dir: str, cfg: EngineConfig):
    """Pass A: term dictionary (df, cf) + corpus stats + hot-term set."""
    from ray.data.aggregate import Sum

    stats_ds = (
        ds.map_batches(
            lambda b: emit_term_stats(b, cfg),
            batch_format="pyarrow",
            batch_size=cfg.analyze_batch_size,
        )
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf"))
    )
    dict_path = os.path.join(index_dir, "dictionary.parquet")
    stats_ds.sort("term").write_parquet(dict_path)

    import pyarrow.dataset as pads

    dict_data = pads.dataset(dict_path)
    sent = dict_data.to_table(filter=pads.field("term") == DOC_SENTINEL)
    n_docs = int(sent["df"][0].as_py()) if sent.num_rows else 0
    total_tokens = int(sent["cf"][0].as_py()) if sent.num_rows else 0
    n_terms = dict_data.count_rows() - sent.num_rows
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    hot_cut = max(2, int(cfg.hot_term_df_ratio * n_docs))
    hot = dict_data.to_table(filter=(pads.field("df") >= hot_cut) & (pads.field("term") != DOC_SENTINEL))
    hot_terms = sorted(hot["term"].to_pylist())
    return n_docs, total_tokens, n_terms, avgdl, hot_terms


def build_index(
    input_path: str,
    index_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    transcripts_ds=None,
    resume: bool = False,
    fail_after_parts: int | None = None,
) -> IndexManifest:
    """End-to-end index build. ``transcripts_ds`` overrides reading
    ``input_path`` directly (it must carry the transcript schema; a
    ``doc_id`` column is added here if absent). ``fail_after_parts`` is
    the fault-injection hook for the resume test (FIXTURES.md §4)."""
    import ray.data as rd

    os.makedirs(index_dir, exist_ok=True)
    ds = transcripts_ds if transcripts_ds is not None else rd.read_parquet(input_path)

    if "doc_id" not in ds.schema().names:
        ds = assign_doc_ids(ds)

    # --- docmap (doc_id → conv_id, turn_idx), sorted by doc_id for
    # row-group-pruned point lookups after top-k ---
    docmap_path = os.path.join(index_dir, "docmap.parquet")
    manifest_path = os.path.join(index_dir, "manifest.json")
    have_partial = resume and os.path.exists(manifest_path)
    if not (have_partial and os.path.isdir(docmap_path) and os.listdir(docmap_path)):
        ds.select_columns(["doc_id", "conv_id", "turn_idx"]).sort("doc_id").write_parquet(docmap_path)

    # --- Pass A: dictionary + stats (reused on resume) ---
    if have_partial:
        manifest = IndexManifest.load(index_dir)
    else:
        n_docs, total_tokens, n_terms, avgdl, hot_terms = build_dictionary(ds, index_dir, cfg)
        manifest = IndexManifest(
            status="building",
            n_docs=n_docs,
            avgdl=avgdl,
            total_tokens=total_tokens,
            n_terms=n_terms,
            k1=cfg.k1,
            b=cfg.b,
            block_size=cfg.block_size,
            num_partitions=cfg.num_partitions,
            analyzer_mode=cfg.analyzer.mode,
            remove_stopwords=cfg.analyzer.remove_stopwords,
            hot_terms=hot_terms,
            hot_term_salt_buckets=cfg.hot_term_salt_buckets,
            input_path=input_path,
        )
        manifest.save(index_dir)

    hot = frozenset(manifest.hot_terms)
    avgdl = manifest.avgdl

    # --- Pass B: postings shuffle, resume-aware ---
    done = completed_parts(index_dir) if resume else {}
    done_parts = set(done.keys())

    postings = ds.map_batches(
        lambda b: emit_postings(b, cfg),
        batch_format="pyarrow",
        batch_size=cfg.analyze_batch_size,
    ).map_batches(
        lambda b: assign_partitions(b, cfg, hot),
        batch_format="pyarrow",
    )
    if done_parts:
        skip = pa.array(sorted(done_parts), pa.int32())

        def _drop_done(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(pc.invert(pc.is_in(b["part"], value_set=skip)))

        postings = postings.map_batches(_drop_done, batch_format="pyarrow")

    if fail_after_parts is not None:
        # fault injection (resume test, FIXTURES.md §4): partitions ≥ K
        # crash before writing; the build dies mid-shuffle with the
        # completed partitions already atomically on disk.
        cut = fail_after_parts

        def _seg_or_fail(g):
            if int(g["part"].iloc[0]) >= cut:
                raise RuntimeError(f"fault injection at part {int(g['part'].iloc[0])}")
            return build_segment(g, index_dir, cfg, avgdl, input_path)

        seg_fn = _seg_or_fail
    else:
        seg_fn = lambda g: build_segment(g, index_dir, cfg, avgdl, input_path)  # noqa: E731

    lineage = postings.groupby("part").map_groups(
        seg_fn,
        batch_format="pandas",
    )
    lineage_rows = lineage.take_all()  # small: one row per partition

    for r in lineage_rows:
        manifest.parts[str(int(r["part"]))] = {
            "n_terms": int(r["n_terms"]),
            "n_rows": int(r["n_rows"]),
            "n_postings": int(r["n_postings"]),
            "elapsed_s": float(r["elapsed_s"]),
        }
    for p, meta in completed_parts(index_dir).items():
        manifest.parts.setdefault(str(p), {k: meta[k] for k in ("n_terms", "n_rows", "n_postings", "elapsed_s") if k in meta})
    manifest.status = "complete"
    manifest.save(index_dir)
    return manifest


def index_stats(index_dir: str) -> dict:
    m = IndexManifest.load(index_dir)
    d = asdict(m)
    d["n_parts"] = len(m.parts)
    d["n_postings"] = sum(p.get("n_postings", 0) for p in m.parts.values())
    return d
