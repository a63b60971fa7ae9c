"""Codec round-trips + PSNR gate (input_hint: PSNR>=40 dB for lossy)."""

import numpy as np
import pytest

from xagg_spark.codecs import decode_tile, encode_tile, phash64, psnr


def _tile(h=32, w=48, seed=7):
    rng = np.random.default_rng(seed)
    return (rng.random((h, w)) * 100.0 - 20.0).astype(np.float32)


def test_raw32_exact():
    a = _tile()
    b = decode_tile(encode_tile(a, "raw32"), "raw32", a.shape[1], a.shape[0])
    assert np.array_equal(a, b)


def test_png16_roundtrip_psnr():
    a = _tile()
    b = decode_tile(encode_tile(a, "png"), "png", a.shape[1], a.shape[0])
    assert b.shape == a.shape
    assert psnr(a, b) >= 80.0  # 16-bit quantization: way above the 40 dB gate


def test_png16_nan_preserved():
    a = _tile()
    a[3, 5] = np.nan
    a[0, 0] = np.nan
    b = decode_tile(encode_tile(a, "png"), "png", a.shape[1], a.shape[0])
    assert np.isnan(b[3, 5]) and np.isnan(b[0, 0])
    m = np.isfinite(a)
    assert psnr(a[m], b[m]) >= 80.0


def test_q8_lossy_meets_gate():
    a = _tile()
    b = decode_tile(encode_tile(a, "q8"), "q8", a.shape[1], a.shape[0])
    assert psnr(a, b) >= 40.0


def test_constant_tile():
    a = np.full((8, 8), 3.25, dtype=np.float32)
    for fmt in ("raw32", "png", "q8"):
        b = decode_tile(encode_tile(a, fmt), fmt, 8, 8)
        assert np.allclose(a, b)


def test_jpeg_stubbed():
    with pytest.raises(NotImplementedError):
        encode_tile(_tile(), "jpeg")
    with pytest.raises(NotImplementedError):
        decode_tile(b"", "jpeg", 1, 1)


def test_phash_deterministic_and_discriminative():
    a = _tile(seed=1)
    assert phash64(a) == phash64(a.copy())
    assert phash64(a) != phash64(_tile(seed=2))
    assert -(1 << 63) <= phash64(a) < (1 << 63)
