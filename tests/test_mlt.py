"""more_like_this: document-as-query (pipelines/query.py::MLTScorer)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.config import EngineConfig
from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
from hybrid_sanctions_search_engine_ray.pipelines.query import more_like_this
from hybrid_sanctions_search_engine_ray.sources.transcripts import transcripts_from_documents


@pytest.fixture(scope="module")
def mlt_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("mlt")
    texts = [
        "spark join filter pipeline",          # 0
        "spark join filter pipeline extra",    # 1  (near-dup of 0)
        "spark shuffle partition",             # 2
        "join filter predicate",               # 3
        "vector embedding cosine",             # 4
        "vector embedding dot product",        # 5
        "totally unrelated words here",        # 6
        "singleton uniqueterm onlyonce",       # 7
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    src = str(d / "documents.parquet")
    pq.write_table(tbl, src)
    idx = str(d / "idx")
    ts = transcripts_from_documents(str(d))
    build_index(src, idx, EngineConfig(num_partitions=4), transcripts_ds=ts)
    return idx, src


def _run(mlt_index, seeds, **kw):
    idx, src = mlt_index
    return more_like_this(
        rd.from_items([{"seed_id": s} for s in seeds]), idx, src, **kw
    ).to_pandas()


def test_mlt_finds_near_duplicate_first(mlt_index):
    res = _run(mlt_index, [0], min_df=2, top_k=3)
    assert not res.empty
    assert int(res[res["rank"] == 1]["doc_id"].iloc[0]) == 1
    # seed never appears in its own results
    assert (res["doc_id"] != 0).all()


def test_mlt_missing_seed_and_no_shared_terms(mlt_index):
    # 999 doesn't exist; doc 7's terms all have df==1 < min_df → no terms
    res = _run(mlt_index, [999, 7], min_df=2, top_k=3)
    assert res.empty


def test_mlt_deterministic(mlt_index):
    a = _run(mlt_index, [0, 4], min_df=2, top_k=5)
    b = _run(mlt_index, [0, 4], min_df=2, top_k=5)
    pd.testing.assert_frame_equal(
        a.sort_values(["seed_id", "rank"]).reset_index(drop=True),
        b.sort_values(["seed_id", "rank"]).reset_index(drop=True),
    )
