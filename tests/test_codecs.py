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


def _retag_tables(buf: bytes, new_id: int = 1) -> bytes:
    """Rewrite a single-component baseline JPEG so every table uses
    ``new_id`` instead of 0 (DQT Tq, DHT Th, SOF Tq ref, SOS Td/Ta) —
    simulates a valid foreign encoder that numbers its tables 1."""
    import struct as _s
    out = bytearray(buf)
    pos = 2
    while pos < len(out):
        marker = out[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = _s.unpack(">H", bytes(out[pos + 2:pos + 4]))
        p0 = pos + 4
        if marker == 0xDB:
            p, end = p0, pos + 2 + ln
            while p < end:
                pq = out[p] >> 4
                out[p] = (out[p] & 0xF0) | new_id
                p += 1 + 64 * (2 if pq else 1)
        elif marker == 0xC4:
            p, end = p0, pos + 2 + ln
            while p < end:
                out[p] = (out[p] & 0xF0) | new_id
                p += 17 + sum(out[p + 1:p + 17])
        elif marker == 0xC0:
            out[p0 + 8] = new_id
        elif marker == 0xDA:
            out[p0 + 2] = (new_id << 4) | new_id
            break
        pos += 2 + ln
    return bytes(out)


def test_jpeg_decoder_honors_declared_table_ids():
    """A stream whose tables are numbered 1 (not 0) must decode via the ids
    declared in SOF/SOS, byte-identically to the id-0 original."""
    from xagg_spark.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray
    from xagg_spark.synth import value_fn

    iy, ix = np.meshgrid(np.arange(24), np.arange(24), indexing="ij")
    arr = value_fn(ix, iy, 3).astype(np.float32)
    buf = encode_jpeg_gray(arr, quality=90)
    got0 = decode_jpeg_gray(buf)
    got1 = decode_jpeg_gray(_retag_tables(buf, 1))
    np.testing.assert_array_equal(got0, got1)


def test_jpeg_inf_clamped_like_nan():
    """+-inf pixels must not corrupt their 8x8 block: they are clamped to
    vmin at encode and restored to NaN by the nan mask at decode."""
    from xagg_spark.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray
    from xagg_spark.codecs.image import psnr
    from xagg_spark.synth import value_fn

    iy, ix = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    arr = value_fn(ix, iy, 4).astype(np.float64)
    arr[2, 3], arr[10, 11] = np.inf, -np.inf
    dec = decode_jpeg_gray(encode_jpeg_gray(arr, quality=96))
    assert np.isnan(dec[2, 3]) and np.isnan(dec[10, 11])
    finite = np.isfinite(arr)
    assert psnr(arr[finite].reshape(1, -1),
                dec[finite].astype(np.float64).reshape(1, -1)) >= 40.0
