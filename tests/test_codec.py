import numpy as np
import pytest

from news_crawler_ray.fixtures import codec


def _px(seed=0, w=64, h=48):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_byte_exact():
    px = _px(1)
    data = codec.encode_png(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = codec.decode_png(data)
    assert np.array_equal(out, px)


def test_lossy_roundtrip_psnr():
    px = _px(2, 128, 128)
    out = codec.decode_lossy(codec.encode_lossy(px))
    assert out.shape == px.shape
    p = codec.psnr(px, out)
    assert p >= 40.0, f"lossy codec PSNR {p} below input_hint invariant"


def test_encode_decode_dispatch():
    px = _px(3, 32, 32)
    for fmt in ("png", "jpeg"):
        out = codec.decode(codec.encode(px, fmt), fmt)
        assert codec.psnr(px, out) >= 40.0
    with pytest.raises(ValueError):
        codec.encode(px, "gif")


def test_phash_deterministic_and_discriminative():
    a, b = _px(4), _px(5)
    assert codec.phash64(a) == codec.phash64(a)
    assert codec.phash64(a) != codec.phash64(b)
    assert -(2**63) <= codec.phash64(a) < 2**63


def test_phash_stable_under_lossy():
    px = _px(6, 64, 64)
    out = codec.decode_lossy(codec.encode_lossy(px))
    ha, hb = codec.phash64(px), codec.phash64(out)
    dist = bin((ha ^ hb) & (2**64 - 1)).count("1")
    assert dist <= 4


def test_tile_hashes_codec_invariant():
    """PNG original and lossy re-encode hash to identical tile bags:
    the hash runs over the 6-bit quantization, the lossy codec's
    fixpoint."""
    import numpy as np

    from news_crawler_ray.fixtures import codec

    r = np.random.default_rng(7)
    px = r.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    rt = codec.decode(codec.encode(px, "jpeg"), "jpeg")
    a = codec.tile_hashes64(px)
    b = codec.tile_hashes64(rt)
    assert a.shape == (16,) and (a == b).all()
    # a grid-aligned crop keeps exactly its interior tiles
    c = codec.tile_hashes64(px[:48, :48])
    assert c.shape == (9,) and set(c) <= set(a)


def test_tile_hashes_partial_edge_dropped():
    import numpy as np

    from news_crawler_ray.fixtures import codec

    px = np.zeros((40, 70, 3), dtype=np.uint8)  # 2x4 full tiles
    assert codec.tile_hashes64(px).shape == (8,)
