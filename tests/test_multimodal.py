import numpy as np
import pytest

from hybrid_sanctions_search_engine_ray.stages.multimodal import (
    FEATURE_DIM,
    DecodeImage,
    ExtractAudioFeatures,
    audio_feature,
    decode_bmp,
    decode_images,
    decode_rawvideo_header,
    decode_wav_pcm16,
    encode_bmp,
    encode_rawvideo,
    encode_wav_pcm16,
    extract_audio,
    frame_sample,
    image_feature,
    rawvideo_frame,
    resize_nearest,
    synthesize_media,
)

# --- real codecs -----------------------------------------------------------


def test_bmp_roundtrip():
    rng = np.random.default_rng(1)
    for h, w in [(7, 5), (16, 16), (1, 33)]:  # odd widths exercise row padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip():
    x = (np.sin(np.linspace(0, 40 * np.pi, 1600)) * 20000).astype(np.int16)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(x, 16000))
    assert rate == 16000 and out.size == 1600
    assert np.allclose(out, x.astype(np.float32) / 32768.0)


def test_rawvideo_frame_extraction():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(6, 4, 5, 3), dtype=np.uint8)
    payload = encode_rawvideo(frames, fps=5)
    assert decode_rawvideo_header(payload) == (5, 4, 6, 5)
    for i in range(6):
        assert np.array_equal(rawvideo_frame(payload, i), frames[i])


# --- real features ---------------------------------------------------------


def test_image_feature_real():
    solid = np.full((32, 32, 3), 255, dtype=np.uint8)
    f = image_feature(solid)
    assert f.shape == (FEATURE_DIM,)
    assert np.allclose(f, 1.0, atol=0.01)      # white image → luminance 1
    black = image_feature(np.zeros((32, 32, 3), dtype=np.uint8))
    assert np.allclose(black, 0.0)


def test_resize_nearest_shapes():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = resize_nearest(img, 3, 8)
    assert out.shape == (3, 8, 3)


def test_audio_feature_spectral_centroid():
    rate = 16000
    t = np.arange(rate) / rate
    low = audio_feature(np.sin(2 * np.pi * 200 * t).astype(np.float32), rate)
    high = audio_feature(np.sin(2 * np.pi * 4000 * t).astype(np.float32), rate)
    assert high[2] > low[2]                      # centroid ordering
    assert abs(low[2] - 200 / 8000) < 0.02       # normalized centroid ≈ f/(rate/2)


# --- decode stages ---------------------------------------------------------


def test_real_bmp_decode_stage():
    t = synthesize_media(8, kind="image")        # real BMP payloads
    out = DecodeImage()(t)                       # no fake needed
    f = np.array(out["feature"].to_pylist())
    assert f.shape == (8, FEATURE_DIM)
    assert (f >= 0).all() and (f <= 1).all()     # real luminance grid
    assert out["decoded_w"].to_pylist() == t["width"].to_pylist()
    assert out["decoded_h"].to_pylist() == t["height"].to_pylist()


def test_real_wav_decode_stage():
    t = synthesize_media(4, kind="audio")        # real WAV payloads
    out = ExtractAudioFeatures()(t)
    counts = []
    for p in t["payload"].to_pylist():
        x, _ = decode_wav_pcm16(p)
        counts.append(x.size)
    assert out["n_samples"].to_pylist() == counts


def test_unsupported_format_raises_without_fake():
    t = synthesize_media(2, kind="blob")         # random bytes, no codec
    with pytest.raises(NotImplementedError):
        DecodeImage()(t)
    with pytest.raises(NotImplementedError):
        ExtractAudioFeatures()(t)


def test_fake_decode_deterministic():
    t = synthesize_media(8, kind="blob")
    d = DecodeImage(fake=True)
    out1, out2 = d(t), d(t)
    assert out1["feature"].to_pylist() == out2["feature"].to_pylist()
    f = np.array(out1["feature"].to_pylist())
    assert f.shape == (8, FEATURE_DIM)
    assert np.abs(f).max() <= 1.0


# --- pipelines -------------------------------------------------------------


def test_decode_actor_pool_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synthesize_media(100, kind="image"))
    out = decode_images(ds, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 100
    assert set(out.columns) == {"media_id", "feature", "decoded_w", "decoded_h"}
    assert sorted(out["media_id"]) == list(range(100))


def test_audio_actor_pool_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synthesize_media(40, kind="audio"))
    out = extract_audio(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 40 and (out["n_samples"] > 0).all()


def test_frame_sample_real_frames(ray_session):
    import ray.data as rd

    t = synthesize_media(10, kind="video")       # RAWV containers, fps=10
    out = rd.from_arrow(t).map_batches(frame_sample, batch_format="pyarrow").to_pandas()
    # every_ms=1000 at 10 fps → every 10th frame
    expected = 0
    for p in t["payload"].to_pylist():
        _, _, n, _ = decode_rawvideo_header(p)
        expected += len(range(0, n, 10))
    assert len(out) == expected
    # sampled frames are REAL decodable BMPs that match the source frame
    first = out.iloc[0]
    src = t["payload"][0].as_py()
    assert np.array_equal(decode_bmp(first["payload"]), rawvideo_frame(src, 0))


def test_video_to_image_feature_pipeline(ray_session):
    """End-to-end: RAWV video → frame sample → image decode stage."""
    import ray.data as rd

    t = synthesize_media(6, kind="video")
    # frame_sample now emits 'payload' directly — no rename glue needed
    frames = rd.from_arrow(t).map_batches(frame_sample, batch_format="pyarrow")
    out = frames.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert len(out) >= 6
    f = np.stack(out["feature"].to_numpy())
    assert f.shape[1] == FEATURE_DIM and (f >= 0).all() and (f <= 1).all()
