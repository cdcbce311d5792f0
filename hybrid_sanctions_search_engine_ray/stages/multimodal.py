"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

Unlike round 1 (where every decode kernel was stubbed), the decoders
for formats expressible with the standard library + numpy are REAL:

* **BMP** (24-bit uncompressed ``BI_RGB``) — parsed/encoded with
  ``struct`` + numpy (bottom-up rows, 4-byte row padding).
* **WAV** (PCM16 mono/stereo) — stdlib ``wave`` + numpy.
* **RAWV** — a tiny documented raw-video container (header + N
  fixed-size RGB frames) for frame sampling; real byte-accurate frame
  extraction, no codec required.

Feature extraction is likewise real: images → 8×8 mean-luminance grid
(64 dims, [0,1]); audio → RMS / zero-crossing rate / spectral centroid
+ 61 log-magnitude FFT bands (64 dims). Media formats that genuinely
need external codecs (JPEG/MP3/H.264…) still raise unless
``fake=True`` supplies the deterministic content-hash stand-in — the
honest boundary in a container with no media libraries.

Scale notes (the part that matters at 100 TB):
* binary payloads make rows wide — these stages use SMALL ``batch_size``
  (default 64) so batch × concurrency fits worker heaps, and rely on
  the streaming executor to spill blocks rather than buffering;
* decode stages are callable CLASSES → actor pools (a real codec/model
  loads once per actor in ``__init__``);
* outputs keep a fixed-size ``list<float32>`` feature column + scalar
  metadata, dropping the binary payload as early as possible so
  downstream stages ship features, not media.

Reference analog: the embedding/indexing media preprocessing the
reference delegates to sentence-transformers and ES ingest
(reference: src/ai_service/layers/embeddings/embedding_service.py —
SURVEY.md §2.3 A1), re-expressed for binary media columns.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

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

# --- real codecs -----------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    header = struct.pack(
        "<2sIHHI" + "IiiHHIIiiII",
        b"BM", 14 + 40 + data_size, 0, 0, 14 + 40,
        40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0,
    )
    # BMP stores BGR, bottom-up, rows padded to 4 bytes
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float32 samples in [-1,1], sample_rate).
    Stereo is downmixed by averaging."""
    with wave.open(io.BytesIO(payload), "rb") as wv:
        n_ch, width, rate = wv.getnchannels(), wv.getsampwidth(), wv.getframerate()
        if width != 2:
            raise ValueError(f"only PCM16 WAV supported (sampwidth={width})")
        raw = wv.readframes(wv.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


RAWV_MAGIC = b"RAWV"


def encode_rawvideo(frames: np.ndarray, fps: int = 10) -> bytes:
    """(N, H, W, 3) uint8 → RAWV container: 20-byte header
    (magic, w, h, n_frames, fps) + concatenated raw RGB frames."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return struct.pack("<4sIIII", RAWV_MAGIC, w, h, n, fps) + frames.tobytes()


def decode_rawvideo_header(payload: bytes) -> tuple[int, int, int, int]:
    magic, w, h, n, fps = struct.unpack_from("<4sIIII", payload, 0)
    if magic != RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    return w, h, n, fps


def rawvideo_frame(payload: bytes, idx: int) -> np.ndarray:
    """Byte-accurate extraction of one frame (no full-payload decode)."""
    w, h, n, _ = decode_rawvideo_header(payload)
    fsz = w * h * 3
    off = 20 + idx * fsz
    return np.frombuffer(payload, dtype=np.uint8, count=fsz, offset=off).reshape(h, w, 3)


# --- real feature kernels --------------------------------------------------


def resize_nearest(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """(H, W, C) → (th, tw, C) nearest-neighbor resize, pure indexing."""
    h, w = img.shape[:2]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def image_feature(img: np.ndarray, grid: int = 8) -> np.ndarray:
    """8×8 mean-luminance grid in [0,1] — a real, deterministic visual
    descriptor (grid² = FEATURE_DIM floats)."""
    lum = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    small = resize_nearest(lum[:, :, None] if lum.ndim == 2 else lum, grid, grid)
    return (small.reshape(grid, grid).astype(np.float32) / 255.0).ravel()


def audio_feature(x: np.ndarray, rate: int, n_bands: int = FEATURE_DIM - 3) -> np.ndarray:
    """[RMS, zero-crossing rate, spectral-centroid (normalized)] +
    ``n_bands`` log-magnitude FFT bands — 64 real dims."""
    if x.size == 0:
        return np.zeros(n_bands + 3, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x**2)))
    # a 1-sample clip has no sign transitions — zcr 0, not the NaN
    # np.mean emits over the empty diff (code-review r05 finding)
    zcr = (float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
           if x.size > 1 else 0.0)
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(x.size, d=1.0 / rate)
    centroid = float((freqs * spec).sum() / spec.sum() / (rate / 2)) if spec.sum() > 0 else 0.0
    idx = np.linspace(0, spec.size, n_bands + 1).astype(np.int64)
    bands = np.add.reduceat(spec, idx[:-1])
    bands = np.log1p(bands / max(1, x.size)).astype(np.float32)
    return np.concatenate(([np.float32(rms), np.float32(zcr), np.float32(centroid)], bands))


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic content-derived pseudo-feature (the stand-in for
    codec-requiring formats): sha256 expanded to `dim` floats in [-1, 1)."""
    out = np.empty(dim, dtype=np.float32)
    h = payload or b"\x00"
    buf = b""
    while len(buf) < dim * 4:
        h = hashlib.sha256(h).digest()
        buf += h
    ints = np.frombuffer(buf[: dim * 4], dtype=np.uint32)
    out[:] = (ints.astype(np.float64) / 2**31 - 1.0).astype(np.float32)
    return out


# --- actor-pool stages -----------------------------------------------------


class DecodeImage:
    """Actor-pool stage: (media_id, payload, mime) → (media_id, feature,
    decoded_w, decoded_h). BMP payloads decode + featurize for REAL;
    codec-requiring formats fall back to the deterministic stand-in when
    ``fake=True`` and raise otherwise."""

    def __init__(self, fake: bool = False, target_size: int = 224):
        self.fake = fake
        self.target_size = target_size

    def _one(self, payload: bytes, mime: str) -> tuple[np.ndarray, int, int]:
        if payload[:2] == b"BM":
            img = decode_bmp(payload)
            h, w = img.shape[:2]
            # image_feature downsamples to its own 8×8 grid, and its
            # output is invariant under the nearest-neighbor pre-resize
            # the stage used to do — skip the wasted 150K-pixel
            # intermediate (code-review r05 finding)
            return image_feature(img), w, h
        if self.fake:
            # -1 = "unknown / not decoded" (MEDIA_SCHEMA convention) —
            # fabricated 224×224 dims looked like real decodes
            # (code-review r05 finding)
            return _fake_feature(payload), -1, -1
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment (BMP decodes natively; "
            "construct with fake=True for the deterministic stand-in)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist() if "mime" in batch.column_names else [""] * len(payloads)
        feats, ws, hs = [], [], []
        for p, m in zip(payloads, mimes):
            f, w, h = self._one(p or b"", m or "")
            feats.append(f)
            ws.append(w)
            hs.append(h)
        fm = np.stack(feats) if feats else np.empty((0, FEATURE_DIM), np.float32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(fm.astype(np.float32).ravel(), pa.float32()), FEATURE_DIM
                ),
                "decoded_w": pa.array(np.asarray(ws, dtype=np.int32)),
                "decoded_h": pa.array(np.asarray(hs, dtype=np.int32)),
            }
        )


class ExtractAudioFeatures:
    """Actor-pool stage: audio payload → fixed-size feature + sample
    count. WAV/PCM16 decodes for REAL (stdlib); other formats need
    ``fake=True``."""

    def __init__(self, fake: bool = False, sample_rate: int = 16000):
        self.fake = fake
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats, counts = [], []
        for p in payloads:
            p = p or b""
            if p[:4] == b"RIFF":
                x, rate = decode_wav_pcm16(p)
                feats.append(audio_feature(x, rate))
                counts.append(x.size)
            elif self.fake:
                feats.append(_fake_feature(p))
                counts.append(max(0, len(p) // 2))
            else:
                raise NotImplementedError(
                    "no codec for this audio format (WAV/PCM16 decodes natively; "
                    "construct with fake=True for the deterministic stand-in)"
                )
        fm = np.stack(feats) if feats else np.empty((0, FEATURE_DIM), np.float32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(fm.astype(np.float32).ravel(), pa.float32()), FEATURE_DIM
                ),
                "n_samples": pa.array(np.asarray(counts, dtype=np.int64)),
            }
        )


def frame_sample(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame sampling (flat-map shape: more rows out than in).
    RAWV payloads sample REAL frames at the requested period (encoded
    back as BMP so the image stage can consume them); other payloads
    fall back to deterministic byte slices."""
    out_ids, out_off, out_payload = [], [], []
    for i in range(batch.num_rows):
        mid = batch["media_id"][i].as_py()
        dur = batch["duration_ms"][i].as_py()
        payload = batch["payload"][i].as_py() or b""
        if payload[:4] == RAWV_MAGIC:
            w, h, n, fps = decode_rawvideo_header(payload)
            step = max(1, int(round(every_ms * fps / 1000.0)))
            for f in range(0, n, step):
                out_ids.append(mid)
                out_off.append(int(f * 1000 / fps))
                out_payload.append(encode_bmp(rawvideo_frame(payload, f)))
        else:
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
            # named "payload" so decode_images consumes frames without
            # caller-side renames (code-review r05 finding)
            "payload": pa.array(out_payload, pa.binary()),
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


def extract_audio(ds, concurrency: int = 4, batch_size: int = 64, fake: bool = False):
    """Dataset with MEDIA_SCHEMA → audio feature table (actor pool)."""
    return ds.map_batches(
        ExtractAudioFeatures,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthesize_media(n: int, seed: int = 5, kind: str = "image") -> pa.Table:
    """Deterministic media table for tests/benchmarks. ``kind`` picks the
    REAL format: image → BMP, audio → WAV/PCM16, video → RAWV; anything
    else → random bytes (exercises the fake path)."""
    rng = np.random.default_rng(seed)
    payloads: list[bytes] = []
    widths, heights, durs = [], [], []
    for _ in range(n):
        if kind == "image":
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            payloads.append(encode_bmp(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)))
            widths.append(w); heights.append(h); durs.append(-1)
        elif kind == "audio":
            n_samp = int(rng.integers(800, 4000))
            payloads.append(encode_wav_pcm16((rng.standard_normal(n_samp) * 8000).astype(np.int16)))
            widths.append(-1); heights.append(-1); durs.append(int(n_samp * 1000 / 16000))
        elif kind == "video":
            nf, w, h = int(rng.integers(4, 12)), 16, 12
            payloads.append(encode_rawvideo(rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8), fps=10))
            widths.append(w); heights.append(h); durs.append(int(nf * 100))
        else:
            payloads.append(rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8).tobytes())
            widths.append(-1); heights.append(-1); durs.append(int(rng.integers(1000, 10000)))
    mime = {"image": "image/bmp", "audio": "audio/wav", "video": "video/rawv"}.get(kind, f"{kind}/fake")
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([mime] * n),
            "width": pa.array(np.asarray(widths, np.int32)),
            "height": pa.array(np.asarray(heights, np.int32)),
            "duration_ms": pa.array(np.asarray(durs, np.int32)),
        }
    )
