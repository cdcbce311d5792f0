"""WebDataset-style tar-shard sink + source.

Large-scale training pipelines exchange corpora as numbered tar shards
of per-sample files (the WebDataset convention: ``shard-000123.tar``
holding ``000000042.txt`` / ``.json`` / ``.jpg`` members, samples
grouped by key). This module implements the TEXT-corpus form with the
stdlib ``tarfile`` — no external deps:

- :func:`export_webdataset` — Dataset → ``shard-%06d.tar`` files. The
  shard of a sample is a PURE FUNCTION of its key
  (``key // samples_per_shard``), so the layout is deterministic,
  partition-count independent, and RESUMABLE: a completed shard (its
  ``.tar`` present with a matching ``_meta`` entry) is skipped on
  re-run — the failed-run-skips-finished-partitions rule every sink in
  this repo follows. One (shard)-keyed exchange; members are written
  key-sorted for byte-stable tars (mtime pinned to 0).
- :func:`read_webdataset` — tar shards → Dataset(doc_id, text), one
  map task per shard (``from_items`` of paths + flat ``map_batches``),
  streaming, no driver-side reads.

Reference analog: none (the reference exports JSONL); this is the
training-data-export member of §2.1 sources/sinks alongside the
sharded-JSONL vector writer (stages/embeddings.write_vectors_json).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa


def export_webdataset(ds, out_dir: str, samples_per_shard: int = 1000,
                      key_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """Write ``ds`` as WebDataset text shards; returns the shard manifest
    (shard, n_samples, n_bytes). Re-running over an existing complete
    layout rewrites nothing (per-shard meta check)."""
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("shard", pa.array(k // samples_per_shard, pa.int64()))

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        import tempfile

        shard = int(g["shard"].iloc[0])
        g = g.sort_values(key_col, kind="mergesort")
        name = f"shard-{shard:06d}.tar"
        path = os.path.join(out_dir, name)
        meta_path = path + ".meta.json"
        # content fingerprint: key/endpoint-only metas let a re-export
        # after a text fix silently keep the stale tar (code-review r05)
        crc = 0
        for k, txt in zip(g[key_col].to_numpy(np.int64),
                          g[text_col].to_numpy(dtype=object)):
            crc = zlib.crc32((txt or "").encode("utf-8"),
                             zlib.crc32(str(int(k)).encode(), crc))
        meta = {"shard": shard, "n_samples": int(len(g)),
                "keys": [int(g[key_col].iloc[0]), int(g[key_col].iloc[-1])],
                "content_crc32": int(crc)}
        if os.path.exists(path) and os.path.exists(meta_path):
            with open(meta_path) as f:
                if json.load(f) == meta:   # complete — resumable skip
                    return pd.DataFrame({"shard": [shard],
                                         "n_samples": [len(g)],
                                         "n_bytes": [os.path.getsize(path)]})
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tar.tmp")
        os.close(fd)
        try:
            with tarfile.open(tmp, "w") as tf:
                for k, txt in zip(g[key_col].to_numpy(np.int64),
                                  g[text_col].to_numpy(dtype=object)):
                    data = (txt or "").encode("utf-8")
                    info = tarfile.TarInfo(name=f"{int(k):09d}.txt")
                    info.size = len(data)
                    info.mtime = 0          # byte-stable shards
                    tf.addfile(info, io.BytesIO(data))
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):     # no leaked .tar.tmp on failure
                os.unlink(tmp)          # (code-review r05 finding)
            raise
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        return pd.DataFrame({"shard": [shard], "n_samples": [len(g)],
                             "n_bytes": [os.path.getsize(path)]})

    manifest = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    return manifest.sort_values("shard", kind="mergesort").reset_index(drop=True)


def read_webdataset(out_dir: str):
    """Tar shards → Dataset(doc_id, text); one map task per shard."""
    import ray.data as rd

    shards = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.endswith(".tar"))

    def load(batch: pd.DataFrame) -> pa.Table:
        ids, texts = [], []
        for path in batch["path"]:
            with tarfile.open(path, "r") as tf:
                for m in tf.getmembers():
                    if not m.name.endswith(".txt"):
                        continue
                    ids.append(int(m.name[:-4]))
                    texts.append(tf.extractfile(m).read().decode("utf-8"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return rd.from_items([{"path": p} for p in shards]).map_batches(
        load, batch_format="pandas", batch_size=1)
