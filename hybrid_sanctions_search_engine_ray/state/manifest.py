"""Index manifest: checkpoint / resume / lineage state.

Layout on disk (all writes atomic: temp file + ``os.replace``, manifest
finalized last — mirroring the reference's atomic snapshot-swap
semantics, reference: src/ai_service/layers/embeddings/indexing/
watchlist_index_service.py:319-457)::

    index_dir/
      manifest.json                  # finalized build: params + stats + lineage
      dictionary.parquet/            # term → df, cf  (the vocabulary)
      docmap.parquet/                # doc_id → conv_id, turn_idx
      segments/part=K/postings.parquet   # encoded posting lists
      segments/part=K/meta.json          # per-partition lineage (written LAST —
                                         # its presence implies the data file is complete)

A build is resumable because each partition's segment file + meta.json
land atomically and independently; a re-run scans ``segments/*/meta.json``
and skips completed partitions (FIXTURES.md §4 semantics).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field
from typing import Any


def atomic_write_json(path: str, obj: Any) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, default=str)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def atomic_publish_file(tmp_path: str, final_path: str) -> None:
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    os.replace(tmp_path, final_path)


@dataclass
class IndexManifest:
    version: int = 1
    status: str = "building"           # building | complete
    # corpus stats (Pass A)
    n_docs: int = 0
    avgdl: float = 0.0
    total_tokens: int = 0
    n_terms: int = 0
    # scoring / layout params (immutable per index)
    k1: float = 1.2
    b: float = 0.75
    block_size: int = 128
    num_partitions: int = 64
    analyzer_mode: str = "simple"
    remove_stopwords: bool = False
    stem: str = ""
    dedup_tokens: bool = False
    # the REST of AnalyzerConfig — persisted so readers reconstruct the
    # exact build analyzer (older manifests default to these; a
    # non-default build without them silently diverged query-side
    # tokenization — code-review r05 finding)
    min_token_len: int = 1
    max_token_len: int = 64
    lang_split_case: bool = False
    lang_col: str | None = None
    store_positions: bool = False
    # skew handling
    hot_terms: list[str] = field(default_factory=list)
    hot_term_salt_buckets: int = 1
    # lineage: part → {n_terms, n_rows, n_postings, checksum, elapsed_s, input}
    parts: dict[str, dict] = field(default_factory=dict)
    input_path: str = ""

    def save(self, index_dir: str) -> None:
        atomic_write_json(os.path.join(index_dir, "manifest.json"), asdict(self))

    @classmethod
    def load(cls, index_dir: str) -> "IndexManifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            d = json.load(f)
        m = cls()
        for k, v in d.items():
            if hasattr(m, k):
                setattr(m, k, v)
        return m


def segment_dir(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, "segments", f"part={part:05d}")


def completed_parts(index_dir: str) -> dict[int, dict]:
    """Scan per-partition meta.json files — the resume source of truth."""
    seg_root = os.path.join(index_dir, "segments")
    done: dict[int, dict] = {}
    if not os.path.isdir(seg_root):
        return done
    for name in os.listdir(seg_root):
        if not name.startswith("part="):
            continue
        meta_path = os.path.join(seg_root, name, "meta.json")
        data_path = os.path.join(seg_root, name, "postings.parquet")
        if os.path.exists(meta_path) and os.path.exists(data_path):
            with open(meta_path) as f:
                done[int(name.split("=")[1])] = json.load(f)
    return done


def analyzer_from_manifest(m: "IndexManifest"):
    """Reconstruct the FULL build analyzer from a manifest — every
    persisted field, not just mode/stopwords/stem (partial
    reconstruction silently diverged query/delta tokenization from the
    build — code-review r05 finding). ``name_field`` is set for
    "_names" stemmers so readers don't re-fire the build-time consent
    warning."""
    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig

    return AnalyzerConfig(
        mode=m.analyzer_mode,
        remove_stopwords=m.remove_stopwords,
        stem=m.stem,
        dedup_tokens=m.dedup_tokens,
        min_token_len=m.min_token_len,
        max_token_len=m.max_token_len,
        lang_split_case=m.lang_split_case,
        lang_col=m.lang_col,
        name_field=m.stem.endswith("_names"),
    )


def analyzer_key(m: "IndexManifest") -> tuple:
    """The analyzer-identity tuple two indexes must share to be
    mergeable / federable — every field that changes tokenization."""
    return (m.analyzer_mode, m.remove_stopwords, m.stem, m.dedup_tokens,
            m.min_token_len, m.max_token_len, m.lang_split_case, m.lang_col)
