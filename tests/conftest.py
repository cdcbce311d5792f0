import os

import pytest
import ray

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory, ray_session):
    """Deterministic synthetic transcript corpus (FIXTURES.md §1)."""
    from hybrid_sanctions_search_engine_ray.sources.transcripts import generate_transcripts

    out = str(tmp_path_factory.mktemp("corpus") / "transcripts")
    generate_transcripts(out, n_convs=120, seed=7, shard_convs=30)
    return out


@pytest.fixture(scope="session")
def built_index(tmp_path_factory, corpus_dir):
    """Index over the session corpus, with knobs forcing sub-segments,
    hot-term salting and many partitions at tiny scale."""
    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index

    cfg = EngineConfig(
        num_partitions=8,
        block_size=16,
        max_postings_per_segment=64,
        hot_term_df_ratio=0.2,
        hot_term_salt_buckets=3,
        hot_term_salt_shift=6,
        analyzer=AnalyzerConfig(mode="simple"),
    )
    index_dir = str(tmp_path_factory.mktemp("index") / "idx")
    manifest = build_index(corpus_dir, index_dir, cfg)
    return index_dir, cfg, manifest
