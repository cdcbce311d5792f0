"""Ray-Data-native full-text index + BM25 query engine.

A brand-new engine with the lexical-path capabilities of the reference
sanctions-search repo (see SURVEY.md): deterministic analyzer chain,
inverted-index construction as a term-partitioned Ray Data shuffle with
delta+varint-compressed postings, BM25 (k1=1.2, b=0.75, Lucene idf)
top-k scoring with block-max pruning, checkpoint-resumable builds with
per-partition lineage, plus the training-data-pipeline operators a
100 TB corpus needs (dedup family, ANN similarity, text analysis,
multimodal plumbing).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` →
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, ``groupby`` for the wide merges. No module in this package calls
``ray.init()``.
"""

from hybrid_sanctions_search_engine_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
