"""Transcript table sources.

The engine's input table has the exact ``input_hint`` shape::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Two deterministic providers:

1. :func:`transcripts_from_documents` — derives a transcripts Dataset
   from the driver's ``documents`` parquet with a pure, SQL-expressible
   row mapping (used by the oracle-checked queries; the identical
   mapping exists as SQL in ``__ray_entry__.TRANSCRIPTS_SQL``).
   ``doc_id`` is carried through: documents' dense ``doc_id`` already
   equals the rank under stable ``(conv_id, turn_idx)`` ordering by
   construction, so the per-row invariant (per-turn text equality under
   stable turn ordering) is trivially join-checkable.

2. :func:`generate_transcripts` — a seeded standalone corpus generator
   (FIXTURES.md §1): Zipfian vocabulary with a stop-word-heavy head
   (posting-list skew), multilingual name tokens, Unicode edge tokens
   (ё/ß/homoglyphs/initials), identifier and date tokens, tool-call
   noise. Used by pytest fixtures and by bench.py at larger scales.
   Writes partitioned parquet so generation itself parallelizes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("doc_id", pa.int64()),
    ]
)

TURNS_PER_CONV = 8
_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["", "search", "calculator", "browser", "python", "sql", "shell", "editor"]
_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00 UTC in microseconds


def documents_batch_to_transcripts(batch: pa.Table) -> pa.Table:
    """Pure row mapping documents → transcripts (SQL parity — see
    TRANSCRIPTS_SQL in __ray_entry__.py; keep the two in lockstep)."""
    doc_id = batch["doc_id"]
    conv_num = pc.divide(doc_id, TURNS_PER_CONV)
    # same 8-digit pad limit as generate_transcripts: a 9-digit conv id
    # would silently break lexicographic == numeric conv ordering
    _mx = pc.max(conv_num).as_py()
    if _mx is not None and _mx >= 10**8:
        raise ValueError(
            f"documents_batch_to_transcripts: conv id {_mx} exceeds the "
            "8-digit pad; widen the pad (and the SQL twins) first")
    conv_id = pc.binary_join_element_wise(
        pa.array(["conv-"] * len(batch)),
        pc.utf8_lpad(pc.cast(conv_num, pa.string()), 8, "0"),
        "",
    )
    turn_idx = pc.cast(pc.subtract(doc_id, pc.multiply(conv_num, TURNS_PER_CONV)), pa.int32())
    role_idx = pc.cast(pc.subtract(doc_id, pc.multiply(pc.divide(doc_id, 3), 3)), pa.int64())
    role = pc.take(pa.array(_ROLES), role_idx)
    tool_idx = pc.cast(pc.subtract(doc_id, pc.multiply(pc.divide(doc_id, 8), 8)), pa.int64())
    tool = pc.take(pa.array(_TOOLS), tool_idx)
    ts = pc.cast(pc.add(pc.multiply(doc_id, 1_000_000), _EPOCH_US), pa.timestamp("us"))
    return pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": batch["text"],
            "tool": tool,
            "ts": ts,
            "doc_id": doc_id,
        }
    )


def transcripts_from_documents(sf_dir: str):
    """documents.parquet → transcripts Dataset (lazy, streaming)."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return ds.map_batches(documents_batch_to_transcripts, batch_format="pyarrow")


# --- standalone seeded generator (FIXTURES.md §1) ---------------------------

_NAME_TOKENS = [
    "иванов", "иван", "петрович", "мария", "александровна", "петрова",
    "сашка", "пушкин", "світлана", "бондаренко", "о'brien", "jean-pierre",
    "müller", "straße", "groß", "петро", "ковальський", "john", "smith",
    "anna", "schmidt", "олена", "шевченко",
]
_UNICODE_EDGE = ["ёжик", "пётр", "weiß", "größe", "а.с.пушкин", "и.и.сидоров",
                 "o'connor", "jean—luc", "café"]
_STOP_HEAD = [
    "payment", "transfer", "от", "до", "платіж", "the", "and", "for", "что",
    "это", "invoice", "amount", "total", "please", "check", "результат",
    "query", "data", "file", "run", "ok", "done", "error", "status",
    "и", "в", "на", "не", "с", "по", "из", "за", "як", "що", "для", "про",
    "is", "to", "of", "in", "it", "a",
]
_BODY_VOCAB_SIZE = 5000


def _vocab() -> list[str]:
    body = [f"tok{i:05d}" for i in range(_BODY_VOCAB_SIZE)]
    return _STOP_HEAD + _NAME_TOKENS + _UNICODE_EDGE + body


def _gen_conv_batch(conv_ids: np.ndarray, seed: int) -> pa.Table:
    """Generate all turns for a batch of conversation ids; deterministic
    per conv_id regardless of batching (rng seeded per conversation)."""
    vocab = np.array(_vocab(), dtype=object)
    n_vocab = len(vocab)
    # Zipf-ish rank probabilities with a heavy stop-word head (s≈1.1)
    ranks = np.arange(1, n_vocab + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    cols: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for cid in conv_ids:
        rng = np.random.default_rng(seed * 1_000_003 + int(cid))
        n_turns = int(rng.integers(2, 25))
        for t in range(n_turns):
            n_tok = int(rng.integers(3, 40))
            toks = rng.choice(vocab, size=n_tok, p=probs)
            role = _ROLES[int(rng.integers(0, 3))]
            text = " ".join(toks.tolist())
            if role == "tool":
                text = text + ' {"arg": %d}' % int(rng.integers(0, 100))
                tool = _TOOLS[1 + int(rng.integers(0, 7))]
            else:
                tool = ""
            if rng.random() < 0.05:
                text += " 1980-01-01"          # date token (analyzer-excluded in full mode)
            if rng.random() < 0.05:
                text += f" {rng.integers(10**9, 10**11)}"  # ITN-like identifier
            cols["conv_id"].append(f"conv-{int(cid):08d}")
            cols["turn_idx"].append(t)
            cols["role"].append(role)
            cols["text"].append(text)
            cols["tool"].append(tool)
            cols["ts"].append(_EPOCH_US + (int(cid) * 1000 + t) * 1_000_000)
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


def generate_transcripts(out_dir: str, n_convs: int, seed: int = 42, shard_convs: int = 2048) -> str:
    """Write a deterministic transcript corpus as partitioned parquet.

    Generation runs as a Ray Data pipeline over conversation-id ranges —
    one task per shard of conversations — so a 10^9-conversation corpus
    generates in parallel and the output is already partitioned for
    resumable reads (one file per conv-range). Returns ``out_dir``.
    Skips work if the directory already has a matching ``_GEN_META``.
    """
    import json

    import ray.data as rd

    meta_path = os.path.join(out_dir, "_GEN_META")
    meta = {"n_convs": n_convs, "seed": seed, "version": 3}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == meta:
                return out_dir
        # parameters changed: regenerating into a dirty dir would leave
        # the previous parameterization's extra shards beside the new
        # ones — a silently corrupt corpus (code-review r05 finding)
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    # conv ids are zero-padded to 8 digits; a 9-digit id would sort
    # lexicographically BEFORE conv-99999999 and silently violate the
    # global-sort precondition of build_index(assume_sorted=True)
    # (code-review r05 finding) — refuse loudly at the limit
    if n_convs > 10**8:
        raise ValueError(
            f"generate_transcripts: n_convs={n_convs} exceeds the 8-digit "
            "conv-id pad; widen the pad (and every conv-id producer/twin) "
            "before generating corpora this large")
    os.makedirs(out_dir, exist_ok=True)

    def expand_and_write(batch: pa.Table) -> pa.Table:
        """Each task writes one shard file named by its first conv id —
        zero-padded so lexicographic file order == conv order, making the
        corpus globally sorted by (conv_id, turn_idx) across files (the
        precondition for ``build_index(assume_sorted=True)``)."""
        import tempfile

        import pyarrow.parquet as pq

        ids = batch["id"].to_numpy()
        tbl = _gen_conv_batch(ids, seed)
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        os.close(fd)
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(out_dir, f"shard-{int(ids.min()):010d}.parquet"))
        return pa.table({"n_rows": pa.array([tbl.num_rows], pa.int64())})

    (
        rd.range(n_convs)
        .repartition(max(1, n_convs // shard_convs))
        .map_batches(expand_and_write, batch_format="pyarrow", batch_size=shard_convs)
        .count()
    )
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return out_dir
