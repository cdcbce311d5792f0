import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hybrid_sanctions_search_engine_ray.functions.codec import (
    block_maxes,
    decode_posting,
    encode_posting,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_single_byte_values():
    vals = np.arange(128, dtype=np.uint64)
    buf = varint_encode(vals)
    assert len(buf) == 128
    assert np.array_equal(varint_decode(buf), vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True),
    st.data(),
)
def test_posting_roundtrip_property(doc_ids, data):
    d = np.sort(np.array(doc_ids, dtype=np.uint64))
    tfs = np.array(data.draw(st.lists(st.integers(1, 1000), min_size=d.size, max_size=d.size)), dtype=np.uint64)
    dls = np.array(data.draw(st.lists(st.integers(1, 5000), min_size=d.size, max_size=d.size)), dtype=np.uint64)
    db, tb, lb = encode_posting(d, tfs, dls)
    d2, t2, l2 = decode_posting(db, tb, lb)
    assert np.array_equal(d2, d)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)


def test_compression_is_compact():
    # dense doc ids → 1-byte deltas
    d = np.arange(10_000, dtype=np.uint64)
    tfs = np.ones(10_000, dtype=np.uint64)
    dls = np.full(10_000, 50, dtype=np.uint64)
    db, tb, lb = encode_posting(d, tfs, dls)
    assert len(db) < 10_100  # ~1 byte per delta
    assert len(tb) == 10_000


def test_block_maxes():
    tfs = np.array([1, 5, 2, 10], dtype=np.uint64)
    dls = np.array([10, 10, 10, 10], dtype=np.uint64)
    bm = block_maxes(tfs, dls, k1=1.2, b=0.75, avgdl=10.0, block_size=2)
    assert bm.shape == (2,)
    # factor is monotone in tf at fixed dl → block maxes at tf=5 and tf=10
    f = lambda tf: tf * 2.2 / (tf + 1.2)  # noqa: E731
    assert np.allclose(bm, [f(5), f(10)], rtol=1e-6)


# --- Elias-Fano -------------------------------------------------------------


def test_ef_roundtrip_random():
    import numpy as np

    from hybrid_sanctions_search_engine_ray.functions.codec import ef_decode, ef_encode

    rng = np.random.default_rng(11)
    for _ in range(100):
        n = int(rng.integers(1, 300))
        u = int(rng.integers(n, 50_000))
        v = np.sort(rng.choice(u, size=n, replace=False)).astype(np.uint64)
        lo, up, l = ef_encode(v, u)
        assert (ef_decode(lo, up, n, l) == v).all()
        assert len(lo) == (n * l + 7) // 8
        assert len(up) == (n + (int(v[-1]) >> l) + 1 + 7) // 8


def test_ef_edge_cases():
    import numpy as np
    import pytest

    from hybrid_sanctions_search_engine_ray.functions.codec import (
        ef_decode,
        ef_encode,
        ef_split_l,
    )

    # dense sequence: l = 0, pure unary upper
    v = np.arange(10, dtype=np.uint64)
    lo, up, l = ef_encode(v, 10)
    assert l == 0 and lo == b""
    assert (ef_decode(lo, up, 10, l) == v).all()
    # single value near the top of a large universe
    v = np.array([999_999], dtype=np.uint64)
    lo, up, l = ef_encode(v, 1_000_000)
    assert (ef_decode(lo, up, 1, l) == v).all()
    assert l == 1_000_000 .bit_length() - 1
    # refusals
    with pytest.raises(ValueError):
        ef_encode(np.empty(0, dtype=np.uint64), 10)
    with pytest.raises(ValueError):
        ef_encode(np.array([10], dtype=np.uint64), 10)
    assert ef_split_l(7, 8) == 0  # u < n → l = 0


def test_ef_roundtrip_hypothesis():
    """Property: any sorted duplicate-free uint sequence in any universe
    round-trips, and the byte counts match the closed-form sizes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from hybrid_sanctions_search_engine_ray.functions.codec import ef_decode, ef_encode

    @settings(max_examples=200, deadline=None)
    @given(st.sets(st.integers(min_value=0, max_value=1 << 40),
                   min_size=1, max_size=200),
           st.integers(min_value=1, max_value=1 << 20))
    def inner(vals, slack):
        v = np.array(sorted(vals), dtype=np.uint64)
        u = int(v[-1]) + slack
        lo, up, l = ef_encode(v, u)
        assert (ef_decode(lo, up, v.size, l) == v).all()
        assert len(lo) == (v.size * l + 7) // 8
        assert len(up) == (v.size + (int(v[-1]) >> l) + 1 + 7) // 8

    inner()
