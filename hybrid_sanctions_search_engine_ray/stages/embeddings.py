"""Embedding generation — the load-once model actor-pool stage.

The Ray-Data re-expression of the reference's embedding service
(reference: src/ai_service/layers/embeddings/embedding_service.py:
17,70,108-150 — a sentence-transformer loaded ONCE per worker and
applied in batches — SURVEY.md §2.3 A1), with the neural model replaced
by a REAL, deterministic, dependency-free embedding function: the
feature-hashing projection (the "hashing trick", Weinberger et al.
ICML'09) of log-scaled token counts into ``dim`` signed buckets,
L2-normalized. It is a genuine working text embedder (similar token
distributions → high cosine), not a stub: no external model exists in
this environment, and every Ray-side property the neural version needs
— one model build per actor, batched vectorized inference, bounded
batch memory, a parquet vector sink — is exercised for real.

Output schema: ``(doc_id:int64, embedding:list<float32>[dim])`` — the
same shape the ``embeddings`` test table and the similarity stages
(stages/similarity.py) consume, so generated vectors flow directly into
``brute_force_topk`` / ``ivf_build``. ``write_embeddings`` is the
vector-sink analog of the reference's vector JSON writer
(scripts/prepare_sanctions_data.py vector export — SURVEY.md §2.1 S4),
emitted as parquet for columnar, partition-pruned reads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig


class HashingEmbedder:
    """Actor-pool callable: text batch → unit-norm hashed embeddings.

    Everything stateful — analyzer config, hash mixing constants, the
    per-token-hash sign/bucket derivation — is built once in
    ``__init__`` (the reference's load-model-once contract); ``__call__``
    is pure vectorized numpy per batch.
    """

    def __init__(self, dim: int = 64, analyzer_cfg: AnalyzerConfig | None = None,
                 seed: int = 17):
        self.dim = dim
        self.cfg = analyzer_cfg or AnalyzerConfig()
        # per-seed mixing constants: two odd multipliers derived once
        rng = np.random.default_rng(seed)
        self.mix_a = np.uint64(rng.integers(1, 2**63) * 2 + 1)
        self.mix_b = np.uint64(rng.integers(1, 2**63) * 2 + 1)

    def _embed_flat(self, parent: np.ndarray, token_hashes: np.ndarray, n_docs: int) -> np.ndarray:
        h = token_hashes * self.mix_a + self.mix_b  # uint64 wrap = part of the hash
        bucket = (h >> np.uint64(32)).astype(np.int64) % self.dim
        sign = np.where((h & np.uint64(1)).astype(bool), 1.0, -1.0)
        # per-(doc, bucket) signed counts in one bincount over flattened keys
        flat_keys = parent * self.dim + bucket
        mat = np.bincount(flat_keys, weights=sign, minlength=n_docs * self.dim)
        mat = mat.reshape(n_docs, self.dim)
        # log-scale magnitudes (tf damping), keep sign
        mat = np.sign(mat) * np.log1p(np.abs(mat))
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        return (mat / np.maximum(norms, 1e-12)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms
        from hybrid_sanctions_search_engine_ray.stages.dedup import _token_hashes

        parent, terms = flat_terms(batch, self.cfg)
        n = batch.num_rows
        if len(terms):
            th = _token_hashes(terms.to_numpy(zero_copy_only=False))
            mat = self._embed_flat(parent, th, n)
        else:
            mat = np.zeros((n, self.dim), dtype=np.float32)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel(), pa.float32()), self.dim)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "embedding": emb.cast(pa.list_(pa.float32())),
            }
        )


class Embedder:
    """Actor-pool callable with a PLUGGABLE encoder backend — the exact
    seam the reference's embedding service exposes (reference:
    embedding_service.py:108-150 loads
    ``sentence-transformers/paraphrase-multilingual-MiniLM-L12-v2`` once
    per worker, then batch-encodes). ``backend_factory`` is a zero-arg
    callable run ONCE per actor in ``__init__`` (the load-model-once
    contract) returning ``encode(texts: list[str]) -> array (n, dim)``
    — e.g. a closure that opens an ONNX session or a sentence-
    transformers model where those exist:

        def factory():
            import onnxruntime  # loaded per actor, never per batch
            sess = onnxruntime.InferenceSession("model.onnx")
            return lambda texts: sess.run(...)

    With no factory it falls back to the deterministic
    :class:`HashingEmbedder` (same output schema), so pipelines are
    backend-agnostic and tests stay exact. Output rows are L2-normalized
    float32 unless ``normalize=False``.
    """

    def __init__(self, dim: int = 64, analyzer_cfg: AnalyzerConfig | None = None,
                 backend_factory=None, normalize: bool = True):
        self.dim = dim
        self.normalize = normalize
        if backend_factory is None:
            self._hash = HashingEmbedder(dim=dim, analyzer_cfg=analyzer_cfg)
            self._encode = None
        else:
            self._hash = None
            self._encode = backend_factory()   # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._encode is None:
            return self._hash(batch)
        texts = [(t or "") for t in batch["text"].to_pylist()]
        mat = np.asarray(self._encode(texts), dtype=np.float32)
        if mat.shape != (len(texts), self.dim):
            raise ValueError(
                f"backend returned shape {mat.shape}, expected ({len(texts)}, {self.dim})"
            )
        if self.normalize:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = (mat / np.maximum(norms, 1e-12)).astype(np.float32)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel(), pa.float32()), self.dim)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "embedding": emb.cast(pa.list_(pa.float32())),
            }
        )


def minilm_backend_factory(model: str =
                           "sentence-transformers/paraphrase-multilingual-MiniLM-L12-v2",
                           dim: int = 384):
    """The REAL-model wiring for :class:`Embedder` — the reference's
    MiniLM-L12-v2 loaded once per actor (reference:
    embedding_service.py:17,70,108-150). Returns a zero-arg factory to
    pass as ``backend_factory``; calling the factory (inside the
    actor's ``__init__``) imports and loads the model there, so the
    driver never holds weights and each actor loads exactly once.

    Tries ``sentence_transformers`` first, then an
    ``onnxruntime`` + ``tokenizers`` session if ``model`` points at an
    .onnx file. Raises ImportError with a clear message when neither
    stack is installed (this sandbox) — the swap is proven by
    ``tests/test_embeddings_backend.py`` (skip-if-unavailable for the
    real load; a fake factory proves the routing either way), and
    rank-quality vs the hashing default is measured by
    :func:`embedding_backend_eval` when weights are present."""
    def factory():
        try:
            from sentence_transformers import SentenceTransformer

            m = SentenceTransformer(model)

            def encode(texts):
                out = m.encode(texts, batch_size=len(texts),
                               normalize_embeddings=False,
                               convert_to_numpy=True)
                if out.shape[1] != dim:
                    raise ValueError(
                        f"model {model} emits dim {out.shape[1]}, "
                        f"factory configured for {dim}")
                return out

            return encode
        except ImportError:
            pass
        if model.endswith(".onnx"):
            try:
                import onnxruntime
                from tokenizers import Tokenizer

                sess = onnxruntime.InferenceSession(model)
                tok = Tokenizer.from_file(model.rsplit(".", 1)[0] + ".tokenizer.json")

                def encode(texts):
                    encs = tok.encode_batch(texts)
                    max_len = max((len(e.ids) for e in encs), default=1)
                    ids = np.zeros((len(texts), max_len), dtype=np.int64)
                    mask = np.zeros_like(ids)
                    for i, e in enumerate(encs):
                        ids[i, :len(e.ids)] = e.ids
                        mask[i, :len(e.ids)] = 1
                    out = sess.run(None, {"input_ids": ids,
                                          "attention_mask": mask})[0]
                    # mean-pool over the mask (MiniLM sentence embedding)
                    w = mask[:, :, None].astype(np.float32)
                    pooled = ((out * w).sum(axis=1)
                              / np.maximum(w.sum(axis=1), 1e-9))
                    if pooled.shape[1] != dim:
                        raise ValueError(
                            f"model {model} emits dim {pooled.shape[1]}, "
                            f"factory configured for {dim}")
                    return pooled

                return encode
            except ImportError:
                pass
        raise ImportError(
            "no embedding backend available: install sentence-transformers, "
            "or onnxruntime+tokenizers with an exported .onnx model")

    return factory


def embedding_backend_eval(ds, query_ids: list[int], k: int = 10,
                           dim_a: int = 64, dim_b: int = 64,
                           factory_a=None, factory_b=None,
                           analyzer_cfg: AnalyzerConfig | None = None):
    """Rank-quality comparison harness between two embedding backends
    (VERDICT r04 item 7): embed the corpus with each backend, run exact
    cosine top-``k`` for ``query_ids`` against both spaces, and report
    per-query rank agreement — ``overlap_at_k`` (|A∩B|/k) plus the mean
    row. Run with ``factory_b=minilm_backend_factory()`` when weights
    are present to quantify the hashing stand-in's ranking gap; with two
    hashing seeds it doubles as a determinism/diversity probe (CI runs
    that form). Returns a pandas DataFrame
    (query_doc_id, overlap_at_k) + a summary row (query_doc_id = -1)."""
    import pandas as pd

    from hybrid_sanctions_search_engine_ray.stages.similarity import (
        brute_force_topk)

    qset = pa.array(sorted(set(int(q) for q in query_ids)), pa.int64())

    def space(factory, dim):
        import pyarrow.compute as pc

        def as_vec(b: pa.Table) -> pa.Table:
            return pa.table({"vec_id": b["doc_id"], "embedding": b["embedding"]})

        emb = (embed_documents(ds, dim=dim, analyzer_cfg=analyzer_cfg,
                               backend_factory=factory)
               .map_batches(as_vec, batch_format="pyarrow").materialize())
        qt = (emb.map_batches(
                  lambda b: b.filter(pc.is_in(b["vec_id"], value_set=qset)),
                  batch_format="pyarrow").to_pandas())
        qt = qt.sort_values("vec_id", kind="mergesort")
        qm = np.stack(qt["embedding"].to_numpy()).astype(np.float64)
        res = brute_force_topk(emb, qt["vec_id"].tolist(), qm, k=k,
                               exclude_self=True).to_pandas()
        return {int(q): list(g["vec_id"]) for q, g in res.groupby("query_vec_id")}

    a = space(factory_a, dim_a)
    b = space(factory_b, dim_b)
    rows = [{"query_doc_id": q,
             "overlap_at_k": round(len(set(a.get(q, [])) & set(b.get(q, []))) / k, 4)}
            for q in sorted(set(a) | set(b))]
    out = pd.DataFrame(rows)
    mean = round(float(out["overlap_at_k"].mean()), 4) if len(out) else 0.0
    return pd.concat([out, pd.DataFrame([{"query_doc_id": -1,
                                          "overlap_at_k": mean}])],
                     ignore_index=True)


def embed_documents(ds, dim: int = 64, analyzer_cfg: AnalyzerConfig | None = None,
                    concurrency: int = 4, batch_size: int = 2048,
                    backend_factory=None):
    """Dataset(doc_id, text) → Dataset(doc_id, embedding) via the
    actor-pool embedder. ``batch_size`` bounds per-actor memory
    (batch × dim float32 + token scratch); size down for huge dims.
    ``backend_factory`` swaps in a real model per :class:`Embedder`."""
    return ds.map_batches(
        Embedder,
        fn_constructor_kwargs={"dim": dim, "analyzer_cfg": analyzer_cfg,
                               "backend_factory": backend_factory},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def write_embeddings(ds, out_path: str, dim: int = 64,
                     analyzer_cfg: AnalyzerConfig | None = None,
                     concurrency: int = 4, batch_size: int = 2048) -> str:
    """The vector sink: embed and persist as parquet (streaming write,
    one file per output block — resumable, partition-prunable)."""
    embed_documents(
        ds, dim=dim, analyzer_cfg=analyzer_cfg,
        concurrency=concurrency, batch_size=batch_size,
    ).write_parquet(out_path)
    return out_path


def write_vectors_json(ds, out_dir: str) -> str:
    """Vector JSON sink (reference parity: scripts/generate_vectors.py:
    134-136 dumps ONE monolithic JSON array; SURVEY.md §2.1 S4). Here:
    newline-delimited JSON, one shard per output block — streaming,
    resumable, and parallel-readable, unlike a single json.dump file.
    Any (id, list<float>) schema passes through unchanged."""
    ds.write_json(out_dir)
    return out_dir


def read_vectors_json(path: str, vector_col: str = "embedding", dtype=pa.float32()):
    """Read a JSONL vector directory back into a Dataset, restoring the
    float32 list dtype JSON cannot carry (JSON numbers parse as float64)."""
    import ray.data as rd

    target = pa.list_(dtype)

    def _cast(batch: pa.Table) -> pa.Table:
        col = batch[vector_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        idx = batch.schema.get_field_index(vector_col)
        return batch.set_column(idx, vector_col, col.cast(target))

    return rd.read_json(path).map_batches(_cast, batch_format="pyarrow")


def rag_retrieve(docs_ds, queries: dict[str, str], dim: int = 32,
                 window: int = 32, stride: int = 24, k: int = 5,
                 analyzer_cfg: AnalyzerConfig | None = None,
                 chunk_id_base: int = 1_000_000):
    """End-to-end RAG retrieval composition — the flow a user of the
    reference's vector tier runs for retrieval-augmented prompting:

    1. token-window CHUNK the corpus (pure flat-map, overlap-preserving);
    2. EMBED every chunk with the load-once actor-pool embedder;
    3. embed the query texts (same hasher, driver-side — query-count-sized);
    4. brute-force cosine TOP-K chunks per query (broadcast query matrix,
       per-batch matmul + partial top-k, tiny merge).

    Every stage streams; nothing corpus-sized is pinned. Returns a pandas
    DataFrame (query_id, rank, doc_id, chunk_idx, cos_sim) — chunk vector
    ids are ``doc_id * chunk_id_base + chunk_idx`` and decomposed back
    before returning. Each batch checks chunk_idx < chunk_id_base and
    0 ≤ doc_id < 2⁶²/chunk_id_base (keeps ids positive and clear of the
    reserved negative query-id space). Feed ONE row per document: rows
    sharing a doc_id would emit colliding chunk ids."""
    import pandas as pd

    from hybrid_sanctions_search_engine_ray.stages.similarity import brute_force_topk
    from hybrid_sanctions_search_engine_ray.stages.textops import chunk_documents

    cfg = analyzer_cfg or AnalyzerConfig()

    def to_chunks(b: pa.Table) -> pa.Table:
        t = chunk_documents(b, cfg, window=window, stride=stride)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci = t["chunk_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ci.size and int(ci.max()) >= chunk_id_base:
            raise ValueError("chunk_idx exceeds chunk_id_base; raise the base")
        if d.size and (int(d.min()) < 0 or int(d.max()) >= (2**62) // chunk_id_base):
            raise ValueError("doc_id out of the encodable non-negative range")
        return pa.table({"doc_id": pa.array(d * chunk_id_base + ci, pa.int64()),
                         "text": t["chunk_text"]})

    emb = embed_documents(docs_ds.map_batches(to_chunks, batch_format="pyarrow"),
                          dim=dim, analyzer_cfg=cfg).map_batches(
        lambda b: b.rename_columns(["vec_id", "embedding"]), batch_format="pyarrow"
    )

    qids = sorted(queries)
    hasher = HashingEmbedder(dim=dim, analyzer_cfg=cfg)
    qtab = hasher(pa.table({"doc_id": pa.array(range(len(qids)), pa.int64()),
                            "text": pa.array([queries[q] for q in qids], pa.string())}))
    qmat = np.stack(qtab["embedding"].to_pandas().to_numpy()).astype(np.float64)
    # query ids live in a disjoint NEGATIVE id space so exclude_self never fires
    res = brute_force_topk(emb, [-(i + 1) for i in range(len(qids))], qmat,
                           k=k, exclude_self=False).to_pandas()
    res["query_id"] = res["query_vec_id"].map({-(i + 1): q for i, q in enumerate(qids)})
    res["doc_id"] = (res["vec_id"] // chunk_id_base).astype(np.int64)
    res["chunk_idx"] = (res["vec_id"] % chunk_id_base).astype(np.int64)
    res["rank"] = res["rank"].astype(np.int32)
    return res[["query_id", "rank", "doc_id", "chunk_idx", "cos_sim"]]


def label_centroids(ds, label_col: str = "label", vec_col: str = "embedding"):
    """Per-label embedding centroid — the class-prototype aggregation a
    curation pipeline uses for diversity pruning / outlier scoring.
    Per batch, vectors scatter-add into label-local float64 sums
    (``np.add.at`` — one pass, no per-row loop); the shuffle carries
    (label, dim, partial_sum) plus a dim=-1 count sentinel, so only
    O(labels × dims) rows ever move. Returns long-format
    (label, dim, centroid, n_vectors)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        labels = b[label_col].to_numpy(zero_copy_only=False)
        m = np.stack(b[vec_col].to_pandas().to_numpy()).astype(np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((uniq.size, m.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=uniq.size)
        k, d = uniq.size, m.shape[1]
        return pa.table({
            label_col: pa.array(np.r_[np.repeat(uniq, d), uniq]),
            "dim": pa.array(np.r_[np.tile(np.arange(d, dtype=np.int64), k),
                                  np.full(k, -1, dtype=np.int64)]),
            "s": pa.array(np.r_[sums.ravel(), counts.astype(np.float64)]),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([label_col, "dim"])
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()
    )
    cnt = agg[agg["dim"] == -1].set_index(label_col)["s"]
    out = agg[agg["dim"] != -1].copy()
    n = out[label_col].map(cnt).to_numpy(dtype=np.float64)
    out["centroid"] = np.round(out["s"].to_numpy() / n, 6)
    out["n_vectors"] = out[label_col].map(cnt).astype(np.int64)
    out = out.sort_values([label_col, "dim"], kind="mergesort").reset_index(drop=True)
    out["dim"] = out["dim"].astype(np.int64)
    return out[[label_col, "dim", "centroid", "n_vectors"]]


_EXA_MIX_A = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden-ratio odd constant
_EXA_MIX_B = np.uint64(0x7F4A7C159E3779B9)


def embed_documents_exact(ds, dim: int = 16,
                          analyzer_cfg: AnalyzerConfig | None = None):
    """Feature-hash embeddings with FULL SQL checkability — the
    exact-oracle twin of :func:`embed_documents`: md5-parity token
    hashes, one uint64 wrap-mix (``h·A + B`` — mod-2^64 replicated with
    UHUGEINT in the SQL twin), bucket = ``mix % dim``, sign = bit 63,
    per-doc signed integer counts, then ONE L2 normalization (the only
    float; emitted round4). Long format (doc_id, dim, val) with zero
    buckets materialized, so the oracle compares every coordinate of
    every document's vector. Same streaming shape as the production
    embedder: tokenize → scatter-add per batch, nothing corpus-sized."""
    import pandas as pd

    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms
    from hybrid_sanctions_search_engine_ray.stages.dedup import _token_hashes_md5
    from hybrid_sanctions_search_engine_ray.stages.textops import round_half_away

    cfg = analyzer_cfg or AnalyzerConfig()

    def embed(b: pa.Table) -> pa.Table:
        parent, terms = flat_terms(b, cfg)
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b.num_rows
        vec = np.zeros((n, dim), dtype=np.int64)
        if len(terms):
            h = _token_hashes_md5(terms.to_numpy(zero_copy_only=False))
            m = h * _EXA_MIX_A + _EXA_MIX_B  # uint64 wrap = the mix
            bucket = (m % np.uint64(dim)).astype(np.int64)
            sign = np.where((m >> np.uint64(63)) & np.uint64(1), -1, 1)
            np.add.at(vec, (parent, bucket), sign)
        norm = np.sqrt((vec.astype(np.float64) ** 2).sum(axis=1))
        norm = np.where(norm == 0.0, 1.0, norm)
        vals = round_half_away(vec / norm[:, None], 4)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, dim)),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), n)),
            "val": pa.array(vals.ravel()),
        })

    return ds.map_batches(embed, batch_format="pyarrow")
