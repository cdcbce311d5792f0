import numpy as np
import pytest

from hybrid_sanctions_search_engine_ray.stages.multimodal import (
    FEATURE_DIM,
    DecodeImage,
    ExtractAudioFeatures,
    decode_images,
    frame_sample,
    synthesize_media,
)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        DecodeImage()
    with pytest.raises(NotImplementedError):
        ExtractAudioFeatures()


def test_fake_decode_deterministic():
    t = synthesize_media(8)
    d = DecodeImage(fake=True)
    out1, out2 = d(t), d(t)
    assert out1["feature"].to_pylist() == out2["feature"].to_pylist()
    f = np.array(out1["feature"].to_pylist())
    assert f.shape == (8, FEATURE_DIM)
    assert np.abs(f).max() <= 1.0


def test_decode_actor_pool_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synthesize_media(100))
    out = decode_images(ds, concurrency=2, batch_size=16, fake=True).to_pandas()
    assert len(out) == 100
    assert set(out.columns) == {"media_id", "feature", "decoded_w", "decoded_h"}
    assert sorted(out["media_id"]) == list(range(100))


def test_audio_features():
    t = synthesize_media(4, kind="audio")
    out = ExtractAudioFeatures(fake=True)(t)
    assert out["n_samples"].to_pylist() == [len(p) // 2 for p in t["payload"].to_pylist()]


def test_frame_sample_explodes_rows(ray_session):
    import ray.data as rd

    t = synthesize_media(10, kind="video")
    out = rd.from_arrow(t).map_batches(frame_sample, batch_format="pyarrow").to_pandas()
    assert len(out) > 10  # flat-map: more rows than inputs
    expected = sum(max(1, d // 1000) for d in t["duration_ms"].to_pylist())
    assert len(out) == expected
