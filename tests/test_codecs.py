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


def test_jpeg_rejects_non_jpeg_bytes():
    # round 2: jpeg is a real from-scratch baseline codec (see
    # test_jpeg_roundtrip_psnr_and_structure); garbage input must raise
    with pytest.raises(ValueError, match="SOI"):
        decode_tile(b"not a jpeg", "jpeg", 1, 1)


def test_phash_deterministic_and_discriminative():
    a = _tile(seed=1)
    assert phash64(a) == phash64(a.copy())
    assert phash64(a) != phash64(_tile(seed=2))
    assert -(1 << 63) <= phash64(a) < (1 << 63)


def test_jpeg_roundtrip_psnr_and_structure():
    """Baseline JPEG codec (from-scratch T.81): structurally valid marker
    stream, PSNR above the 40 dB lossy gate, NaN mask round-trips, flat
    tiles exact, non-multiple-of-8 shapes pad/crop correctly."""
    from xagg_spark.codecs.image import decode_tile, encode_tile, psnr
    from xagg_spark.synth import value_fn

    iy, ix = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    arr = value_fn(ix, iy, 1).astype(np.float32)
    buf = encode_tile(arr, "jpeg")
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xc0", b"\xff\xc4", b"\xff\xdb", b"\xff\xda"):
        assert marker in buf
    assert len(buf) < arr.nbytes          # actually compresses
    dec = decode_tile(buf, "jpeg", 64, 64)
    assert psnr(arr, dec) >= 40.0

    arr2 = arr.copy()
    arr2[3:9, 10:20] = np.nan
    d2 = decode_tile(encode_tile(arr2, "jpeg"), "jpeg", 64, 64)
    assert np.isnan(d2[5, 15]) and not np.isnan(d2[0, 0])
    assert psnr(arr2, d2) >= 40.0

    a3 = value_fn(ix[:50, :37], iy[:50, :37], 0).astype(np.float32)
    d3 = decode_tile(encode_tile(a3, "jpeg"), "jpeg", 37, 50)
    assert d3.shape == (50, 37) and psnr(a3, d3) >= 40.0

    flat = np.full((16, 16), 7.25, dtype=np.float32)
    df = decode_tile(encode_tile(flat, "jpeg"), "jpeg", 16, 16)
    np.testing.assert_allclose(df, flat, atol=1e-6)


def test_jpeg_decoder_reads_tables_from_stream():
    """The decoder must honor DHT/DQT from the stream, not assume Annex K:
    re-encode at a different quality (different DQT) and decode."""
    from xagg_spark.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray
    from xagg_spark.codecs.image import psnr
    from xagg_spark.synth import value_fn

    iy, ix = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    arr = value_fn(ix, iy, 2).astype(np.float32)
    lo = decode_jpeg_gray(encode_jpeg_gray(arr, quality=40))
    hi = decode_jpeg_gray(encode_jpeg_gray(arr, quality=98))
    assert psnr(arr, hi) > psnr(arr, lo) > 15.0
