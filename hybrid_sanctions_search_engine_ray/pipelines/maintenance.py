"""Index maintenance: tombstone deletes and physical compaction.

Lucene/Elasticsearch delete semantics (the reference deletes by
reindex + atomic alias swap; ES itself tombstones and purges at segment
merge — reference: src/ai_service/layers/search/elasticsearch_adapters.py
index-swap flow, SURVEY.md §2.1 S8):

* :func:`delete_docs` — record doc ids in ``tombstones.json`` (atomic
  write). Queries exclude tombstoned docs immediately; corpus statistics
  (N, avgdl, df/idf) intentionally still count them — exactly Lucene's
  deleted-docs-until-merge behavior, which keeps scoring stable between
  maintenance windows. The JSON set is fine for realistic delete volumes
  (tombstones ≪ corpus); a parquet set with the same semantics is the
  upgrade path past ~10⁷ pending deletes.
* :func:`compact_index` — the "merge": one Ray task per partition
  rewrites its segment file without the tombstoned postings (atomic
  tmp+rename, meta.json last — the same crash-safety contract as the
  build), then the manifest's corpus stats are corrected exactly and the
  tombstone set is cleared. Each removed doc's length is recovered from
  the posting rows themselves (every posting row carries ``dl``), so no
  corpus re-read, no text needed. Partition tasks are independent and
  idempotent — a crashed compaction re-runs safely.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from hybrid_sanctions_search_engine_ray.functions.codec import (
    decode_posting,
    decode_positions,
    encode_positions,
    encode_posting,
)
from hybrid_sanctions_search_engine_ray.state.manifest import (
    IndexManifest,
    atomic_write_json,
    segment_dir,
)

_TOMBSTONE_FILE = "tombstones.json"


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted int64 array of tombstoned doc ids (empty if none)."""
    import json

    p = os.path.join(index_dir, _TOMBSTONE_FILE)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    with open(p) as f:
        ids = json.load(f)["doc_ids"]
    return np.array(sorted(set(ids)), dtype=np.int64)


def delete_docs(index_dir: str, doc_ids: Iterable[int]) -> int:
    """Tombstone doc ids (idempotent union). Returns the total pending
    tombstone count. Readers opened AFTER this call exclude the docs."""
    current = set(load_tombstones(index_dir).tolist())
    current.update(int(d) for d in doc_ids)
    atomic_write_json(
        os.path.join(index_dir, _TOMBSTONE_FILE), {"doc_ids": sorted(current)}
    )
    return len(current)


@ray.remote
def _compact_part(index_dir: str, part: int, tomb: np.ndarray, positional: bool) -> dict:
    """Rewrite one partition's segment without tombstoned postings.
    Returns {doc_id: dl} of postings actually removed here (the driver
    dedups across partitions for the exact stats correction)."""
    sdir = segment_dir(index_dir, part)
    f = os.path.join(sdir, "postings.parquet")
    if not os.path.exists(f):
        return {"removed": {}, "n_terms": 0, "n_rows": 0, "n_postings": 0}
    tbl = pq.read_table(f)
    cols: dict[str, list] = {c: [] for c in tbl.column_names}
    removed: dict[int, int] = {}
    n_postings = 0
    terms_kept: set[str] = set()
    for i in range(tbl.num_rows):
        d, t, l = decode_posting(
            tbl["docs"][i].as_py(), tbl["tfs"][i].as_py(), tbl["dls"][i].as_py()
        )
        pos = np.searchsorted(tomb, d)
        hit = (pos < tomb.size) & (tomb[np.minimum(pos, tomb.size - 1)] == d) if tomb.size else np.zeros(d.size, bool)
        if not hit.any():
            for c in tbl.column_names:
                cols[c].append(tbl[c][i].as_py())
            n_postings += int(d.size)
            terms_kept.add(tbl["term"][i].as_py())
            continue
        for doc, dl in zip(d[hit].tolist(), l[hit].tolist()):
            removed[int(doc)] = int(dl)
        keep = ~hit
        if not keep.any():
            continue  # whole sub-segment gone
        dk, tk, lk = d[keep], t[keep], l[keep]
        db, tb, lb = encode_posting(dk, tk, lk)
        row = {
            "term": tbl["term"][i].as_py(),
            "seg_idx": tbl["seg_idx"][i].as_py(),
            "n_docs": int(dk.size),
            "cf": int(tk.sum()),
            "max_tf": int(tk.max()),
            "docs": db,
            "tfs": tb,
            "dls": lb,
        }
        if positional:
            flat, offs = decode_positions(tbl["poss"][i].as_py(), t)
            parts = [flat[offs[j]: offs[j + 1]] for j in range(d.size) if keep[j]]
            flat_k = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
            row["poss"] = encode_positions(flat_k, tk)
        for c in tbl.column_names:
            cols[c].append(row[c])
        n_postings += int(dk.size)
        terms_kept.add(row["term"])
    out = pa.table({c: pa.array(cols[c], tbl.schema.field(c).type) for c in tbl.column_names})
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=sdir, suffix=".parquet.tmp")
    os.close(fd)
    pq.write_table(out, tmp, row_group_size=4096)
    os.replace(tmp, f)
    meta_path = os.path.join(sdir, "meta.json")
    if os.path.exists(meta_path):
        import json

        with open(meta_path) as mf:
            meta = json.load(mf)
        meta.update(
            n_terms=len(terms_kept), n_rows=out.num_rows, n_postings=n_postings,
            bytes=os.path.getsize(f),
        )
        atomic_write_json(meta_path, meta)
    return {"removed": removed, "n_terms": len(terms_kept),
            "n_rows": out.num_rows, "n_postings": n_postings}


def compact_index(index_dir: str) -> IndexManifest:
    """Physically purge tombstoned docs from every segment and correct
    the manifest's corpus statistics exactly (N, total_tokens, avgdl —
    each removed doc's dl is recovered from its posting rows). Clears
    the tombstone set. No-op when nothing is tombstoned."""
    m = IndexManifest.load(index_dir)
    tomb = load_tombstones(index_dir)
    if tomb.size == 0:
        return m
    positional = bool(getattr(m, "store_positions", False))
    tomb_ref = ray.put(tomb)
    results = ray.get([
        _compact_part.remote(index_dir, int(p), tomb_ref, positional)
        for p in sorted(int(k) for k in m.parts)
    ])
    removed: dict[int, int] = {}
    for p, r in zip(sorted(int(k) for k in m.parts), results):
        removed.update(r["removed"])  # same doc across parts carries the same dl
        m.parts[str(p)].update(
            n_terms=r["n_terms"], n_rows=r["n_rows"], n_postings=r["n_postings"]
        )
    m.n_docs -= len(removed)
    m.total_tokens -= sum(removed.values())
    m.avgdl = (m.total_tokens / m.n_docs) if m.n_docs else 0.0
    m.n_terms = sum(p.get("n_terms", 0) for p in m.parts.values())
    m.save(index_dir)
    os.remove(os.path.join(index_dir, _TOMBSTONE_FILE))
    return m
