"""WebDataset tar-shard sink/source (sources/webdataset.py):
round-trip fidelity, deterministic/byte-stable shards, resumable skip."""

from __future__ import annotations

import os
import tarfile

import numpy as np
import pandas as pd

from hybrid_sanctions_search_engine_ray.sources.webdataset import (
    export_webdataset,
    read_webdataset,
)


def _docs(ray_session, n=250, blocks=4):
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"doc {i} пример текста — {'x' * (i % 23)}" for i in range(n)],
    })
    return rd.from_pandas(df).repartition(blocks), df


def test_roundtrip_exact(ray_session, tmp_path):
    ds, df = _docs(ray_session)
    out = os.path.join(str(tmp_path), "wds")
    man = export_webdataset(ds, out, samples_per_shard=64)
    assert man["n_samples"].sum() == len(df)
    assert list(man["shard"]) == [0, 1, 2, 3]
    back = (read_webdataset(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back, df)


def test_shards_byte_stable_and_resumable(ray_session, tmp_path):
    ds, _ = _docs(ray_session, n=100)
    out = os.path.join(str(tmp_path), "wds")
    export_webdataset(ds, out, samples_per_shard=50)
    p = os.path.join(out, "shard-000000.tar")
    b1 = open(p, "rb").read()
    m1 = os.path.getmtime(p)
    # second run: complete shards are skipped, bytes untouched
    export_webdataset(ds, out, samples_per_shard=50)
    assert os.path.getmtime(p) == m1 and open(p, "rb").read() == b1
    # members are key-sorted, zero-mtime (deterministic bytes)
    with tarfile.open(p) as tf:
        names = [m.name for m in tf.getmembers()]
        assert names == sorted(names)
        assert all(m.mtime == 0 for m in tf.getmembers())


def test_empty_text_and_unicode(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.array([5, 6], dtype=np.int64),
                       "text": ["", "ёжик — groß"]})
    out = os.path.join(str(tmp_path), "wds")
    export_webdataset(rd.from_pandas(df), out, samples_per_shard=10)
    back = read_webdataset(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)
