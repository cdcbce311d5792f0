"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): ``DecodeImage``/``ExtractAudioFeatures`` raise
``NotImplementedError`` unless constructed with ``fake=True``, in which
case they produce deterministic content-derived features so the
Ray-side plumbing — schema, batch sizing for large binary payloads,
actor lifecycle, output layout — is real and tested end-to-end.

Scale notes (the part that matters at 100 TB):
* binary payloads make rows wide — these stages use SMALL ``batch_size``
  (default 64) so batch × concurrency fits worker heaps, and rely on
  the streaming executor to spill blocks rather than buffering;
* the media-decode stage is a callable CLASS → actor pool: a real
  decoder loads codecs/models once per actor in ``__init__``;
* outputs keep a fixed-size ``list<float32>`` feature column +
  scalar metadata, dropping the binary payload as early as possible so
  downstream stages ship features, not media.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),          # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 64


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic content-derived pseudo-feature (stands in for a real
    decoder+model): sha256 expanded to `dim` floats in [-1, 1)."""
    out = np.empty(dim, dtype=np.float32)
    h = payload or b"\x00"
    buf = b""
    while len(buf) < dim * 4:
        h = hashlib.sha256(h).digest()
        buf += h
    ints = np.frombuffer(buf[: dim * 4], dtype=np.uint32)
    out[:] = (ints.astype(np.float64) / 2**31 - 1.0).astype(np.float32)
    return out


class DecodeImage:
    """Actor-pool stage: (media_id, payload) → (media_id, feature,
    decoded_w, decoded_h). Real decoding requires an image library that
    is not available here — construct with ``fake=True`` to run the
    deterministic stand-in; the actor/batch plumbing is identical."""

    def __init__(self, fake: bool = False, target_size: int = 224):
        self.fake = fake
        self.target_size = target_size
        if not fake:
            raise NotImplementedError(
                "image decoding requires an image library not present in this "
                "environment; construct with fake=True for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([_fake_feature(p) for p in payloads]) if payloads else np.empty((0, FEATURE_DIM), np.float32)
        n = len(payloads)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), FEATURE_DIM
                ),
                "decoded_w": pa.array(np.full(n, self.target_size, dtype=np.int32)),
                "decoded_h": pa.array(np.full(n, self.target_size, dtype=np.int32)),
            }
        )


class ExtractAudioFeatures:
    """Actor-pool stage: audio payload → fixed-size feature + sample
    stats. Same stub contract as DecodeImage."""

    def __init__(self, fake: bool = False, sample_rate: int = 16000):
        self.fake = fake
        self.sample_rate = sample_rate
        if not fake:
            raise NotImplementedError(
                "audio decoding requires an audio library not present in this "
                "environment; construct with fake=True for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([_fake_feature(p) for p in payloads]) if payloads else np.empty((0, FEATURE_DIM), np.float32)
        n_samples = np.array([max(0, len(p or b"") // 2) for p in payloads], dtype=np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), FEATURE_DIM
                ),
                "n_samples": pa.array(n_samples),
            }
        )


def frame_sample(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame sampling stub: emit one row per sampled frame offset
    (flat-map shape: more rows out than in). Payload slicing is a
    deterministic fake; the row-explosion plumbing is real."""
    out_ids, out_off, out_payload = [], [], []
    for i in range(batch.num_rows):
        mid = batch["media_id"][i].as_py()
        dur = batch["duration_ms"][i].as_py()
        payload = batch["payload"][i].as_py() or b""
        n_frames = max(1, (dur if dur and dur > 0 else 1000) // every_ms)
        for f in range(n_frames):
            off = f * every_ms
            out_ids.append(mid)
            out_off.append(off)
            lo = (off * 7) % max(1, len(payload)) if payload else 0
            out_payload.append(payload[lo : lo + 64])
    return pa.table(
        {
            "media_id": pa.array(out_ids, pa.int64()),
            "frame_ms": pa.array(out_off, pa.int32()),
            "frame_payload": pa.array(out_payload, pa.binary()),
        }
    )


def decode_images(ds, concurrency: int = 4, batch_size: int = 64, fake: bool = False):
    """Dataset with MEDIA_SCHEMA → image feature table (actor pool)."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,   # small: payload bytes dominate row width
        concurrency=concurrency,
    )


def synthesize_media(n: int, seed: int = 5, kind: str = "image") -> pa.Table:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([f"{kind}/fake"] * n),
            "width": pa.array(np.full(n, -1, np.int32)),
            "height": pa.array(np.full(n, -1, np.int32)),
            "duration_ms": pa.array(rng.integers(1000, 10000, size=n).astype(np.int32)),
        }
    )
