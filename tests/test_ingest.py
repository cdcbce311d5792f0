"""Ingest pipeline processor chain (stages/ingest.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from hybrid_sanctions_search_engine_ray.stages.ingest import compile_pipeline, ingest


def _tbl():
    return pa.table({
        "k": pa.array(["a", "b", "c"]),
        "txt": pa.array(["  Hello 42 ", "WORLD", "x9y"]),
        "n": pa.array([105, 7, 230], pa.int64()),
    })


def test_processors_apply_in_order():
    run = compile_pipeline([
        {"trim": {"field": "txt"}},
        {"lowercase": {"field": "txt"}},
        {"gsub": {"field": "txt", "pattern": "[0-9]+", "replacement": "#"}},
        {"rename": {"field": "txt", "target_field": "t2"}},
        {"script": {"target_field": "bucket", "expr": ("n", "floordiv", 100)}},
        {"convert": {"field": "n", "type": "float"}},
        {"set": {"field": "v", "value": 1}},
        {"enrich": {"field": "k", "target_field": "name",
                    "map": {"a": "Alpha", "b": "Beta"}, "default": "?"}},
        {"remove": {"field": "k"}},
    ])
    out = run(_tbl())
    assert out.column_names == ["t2", "n", "bucket", "v", "name"]
    assert out["t2"].to_pylist() == ["hello #", "world", "x#y"]
    assert out["bucket"].to_pylist() == [1, 0, 2]
    assert out["n"].type == pa.float64()
    assert out["name"].to_pylist() == ["Alpha", "Beta", "?"]


def test_pipeline_validates_at_compile_time():
    with pytest.raises(ValueError, match="unknown ingest processor"):
        compile_pipeline([{"explode": {"field": "x"}}])
    with pytest.raises(ValueError, match="script op"):
        compile_pipeline([{"script": {"target_field": "y", "expr": ("n", "pow", 2)}}])
    with pytest.raises(ValueError, match="convert type"):
        compile_pipeline([{"convert": {"field": "n", "type": "bool"}}])
    with pytest.raises(ValueError, match="single"):
        compile_pipeline([{"set": {"field": "a", "value": 1}, "remove": {"field": "b"}}])


def test_ingest_streams_dataset(ray_session):
    ds = rd.from_arrow(_tbl())
    out = ingest(ds, [{"uppercase": {"field": "k", "target_field": "K"}}]).to_pandas()
    assert out["K"].tolist() == ["A", "B", "C"]
