"""Checkpoint/resume (FIXTURES.md §4): a build killed mid-shuffle must
resume building only the missing partitions and produce an index
byte-identical in content to an uninterrupted build."""

import os

import pyarrow.parquet as pq
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
from hybrid_sanctions_search_engine_ray.state.manifest import completed_parts

CFG = EngineConfig(
    num_partitions=6,
    block_size=16,
    max_postings_per_segment=64,
    hot_term_df_ratio=0.2,
    hot_term_salt_buckets=2,
    hot_term_salt_shift=6,
    analyzer=AnalyzerConfig(mode="simple"),
)


def _segment_contents(index_dir):
    out = {}
    seg_root = os.path.join(index_dir, "segments")
    for p in sorted(os.listdir(seg_root)):
        t = pq.read_table(os.path.join(seg_root, p, "postings.parquet"))
        out[p] = t.sort_by([("term", "ascending"), ("seg_idx", "ascending")]).to_pydict()
    return out


def test_interrupt_and_resume(tmp_path, corpus_dir):
    clean_dir = str(tmp_path / "clean")
    build_index(corpus_dir, clean_dir, CFG)

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(Exception):
        build_index(corpus_dir, crash_dir, CFG, fail_after_parts=3)

    done_before = set(completed_parts(crash_dir).keys())
    assert len(done_before) < CFG.num_partitions, "crash must leave missing partitions"

    # resume: completes only the missing partitions
    manifest = build_index(corpus_dir, crash_dir, CFG, resume=True)
    assert manifest.status == "complete"
    done_after = set(completed_parts(crash_dir).keys())
    assert done_before <= done_after

    # identical content to the uninterrupted build
    assert _segment_contents(crash_dir) == _segment_contents(clean_dir)
    # lineage covers every partition
    assert set(manifest.parts.keys()) == {str(p) for p in done_after}


def test_resume_noop_when_complete(tmp_path, corpus_dir):
    d = str(tmp_path / "idx")
    m1 = build_index(corpus_dir, d, CFG)
    mtimes = {}
    seg_root = os.path.join(d, "segments")
    for p in os.listdir(seg_root):
        f = os.path.join(seg_root, p, "postings.parquet")
        mtimes[p] = os.path.getmtime(f)
    m2 = build_index(corpus_dir, d, CFG, resume=True)
    assert m2.n_docs == m1.n_docs
    for p, t in mtimes.items():
        assert os.path.getmtime(os.path.join(seg_root, p, "postings.parquet")) == t, "completed partition was rebuilt"
