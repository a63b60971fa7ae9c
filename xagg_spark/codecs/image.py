"""Image tile codecs, pure numpy + stdlib (no PIL in this environment).

The engine's input is an Iceberg/parquet table of image rows
(image_id, bytes, w, h, fmt, caption, phash) per BASELINE.json input_hint.
Tiles are single-channel float rasters.  Formats:

- ``raw32``  : float32 little-endian, row-major, exact round-trip (lossless).
- ``png``    : real PNG, 16-bit grayscale, zlib + scanline filters; the
               float->uint16 scale is carried in a tEXt chunk ``xagg_scale``.
               Lossy by quantization; PSNR >> 40 dB.
- ``q8``     : 8-byte header (vmin, vmax float32 LE) + h*w uint8 payload.
               Deliberately coarse lossy format to exercise the PSNR gate.
- ``jpeg``   : real baseline grayscale JPEG (codecs.jpeg — from-scratch
               T.81 DCT/Huffman, no libjpeg in env); float scale + NaN mask
               ride in APP15 segments.  Lossy; PSNR > 40 dB at the default
               quality.

Decoders are batch-oriented: they run inside ``mapInArrow``/pandas UDFs, one
call per Arrow batch, never per-row Python in the hot loop beyond the
per-tile numpy ops (tiles are whole arrays, so per-tile numpy IS vectorized).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw32", "png", "q8", "jpeg")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _encode_png16(arr: np.ndarray) -> bytes:
    """Minimal 16-bit grayscale PNG encoder (filter 0 scanlines)."""
    h, w = arr.shape
    vmin = float(np.nanmin(arr)) if arr.size else 0.0
    vmax = float(np.nanmax(arr)) if arr.size else 1.0
    if not np.isfinite(vmin):
        vmin, vmax = 0.0, 1.0
    scale = (vmax - vmin) or 1.0
    # NaN encodes as 0 with a separate NaN bitmask chunk
    nan_mask = ~np.isfinite(arr)
    filled = np.where(nan_mask, vmin, arr)
    q = np.round((filled - vmin) / scale * 65535.0).astype(">u2")
    raw = bytearray()
    for row in q:
        raw.append(0)  # filter type 0
        raw += row.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    meta = f"{vmin!r},{vmax!r}".encode()
    out = [_PNG_SIG, _chunk(b"IHDR", ihdr),
           _chunk(b"tEXt", b"xagg_scale\x00" + meta)]
    if nan_mask.any():
        out.append(_chunk(b"tEXt", b"xagg_nanmask\x00"
                          + zlib.compress(np.packbits(nan_mask).tobytes())))
    out += [_chunk(b"IDAT", zlib.compress(bytes(raw), 6)), _chunk(b"IEND", b"")]
    return b"".join(out)


def _unfilter(data: np.ndarray, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4)."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = data[pos]
        pos += 1
        line = data[pos:pos + stride].astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                if ftype == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (line[i] + pr) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out


def _decode_png16(buf: bytes) -> np.ndarray:
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = None
    vmin, vmax = 0.0, 1.0
    nanbits = None
    while pos < len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 16 or ctype != 0:
                raise ValueError("only 16-bit grayscale PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"tEXt":
            key, _, val = payload.partition(b"\x00")
            if key == b"xagg_scale":
                vmin, vmax = (float(x) for x in val.decode().split(","))
            elif key == b"xagg_nanmask":
                nanbits = zlib.decompress(val)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    un = _unfilter(raw, w, h, bpp=2)
    q = un.reshape(h, w * 2).view(">u2").reshape(h, w).astype(np.float64)
    arr = (q / 65535.0 * (vmax - vmin) + vmin).astype(np.float32)
    if nanbits is not None:
        mask = np.unpackbits(np.frombuffer(nanbits, dtype=np.uint8),
                             count=h * w).reshape(h, w).astype(bool)
        arr = np.where(mask, np.float32(np.nan), arr)
    return arr


def encode_tile(arr: np.ndarray, fmt: str) -> bytes:
    """Encode a (h, w) float array; deterministic for a given input."""
    arr = np.asarray(arr, dtype=np.float32)
    if fmt == "raw32":
        return arr.astype("<f4").tobytes()
    if fmt == "png":
        return _encode_png16(arr)
    if fmt == "q8":
        finite = arr[np.isfinite(arr)]
        vmin = float(finite.min()) if finite.size else 0.0
        vmax = float(finite.max()) if finite.size else 1.0
        scale = (vmax - vmin) or 1.0
        q = np.round((np.nan_to_num(arr, nan=vmin) - vmin) / scale * 255.0).astype(np.uint8)
        return struct.pack("<ff", vmin, vmax) + q.tobytes()
    if fmt == "jpeg":
        from .jpeg import encode_jpeg_gray
        return encode_jpeg_gray(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_tile(buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode one tile to (h, w) float32."""
    if fmt == "raw32":
        return np.frombuffer(buf, dtype="<f4").reshape(h, w).astype(np.float32)
    if fmt == "png":
        arr = _decode_png16(buf)
        if arr.shape != (h, w):
            raise ValueError(f"PNG shape {arr.shape} != ({h},{w})")
        return arr
    if fmt == "q8":
        vmin, vmax = struct.unpack("<ff", buf[:8])
        q = np.frombuffer(buf[8:], dtype=np.uint8).reshape(h, w)
        return (q.astype(np.float32) / 255.0 * (vmax - vmin) + vmin)
    if fmt == "jpeg":
        from .jpeg import decode_jpeg_gray
        arr = decode_jpeg_gray(buf)
        if arr.shape != (h, w):
            raise ValueError(f"JPEG shape {arr.shape} != ({h},{w})")
        return arr
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_batch(bufs, fmts, ws, hs):
    """Decode a batch (lists/arrays of equal length) -> list of (h,w) float32."""
    return [decode_tile(b, f, int(w), int(h))
            for b, f, w, h in zip(bufs, fmts, ws, hs)]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB over finite entries."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    m = np.isfinite(a) & np.isfinite(b)
    if not m.any():
        return float("inf")
    mse = float(np.mean((a[m] - b[m]) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(np.max(np.abs(a[m]))) or 1.0
    return 10.0 * np.log10(peak * peak / mse)


def phash64(arr: np.ndarray) -> int:
    """Deterministic 64-bit perceptual hash: 8x8 block means vs their median."""
    a = np.nan_to_num(np.asarray(arr, dtype=np.float64), nan=0.0)
    h, w = a.shape
    th, tw = max(h // 8, 1), max(w // 8, 1)
    blocks = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = a[i * th:(i + 1) * th or None, j * tw:(j + 1) * tw or None].mean() \
                if a[i * th:(i + 1) * th, j * tw:(j + 1) * tw].size else 0.0
    bits = (blocks > np.median(blocks)).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v  # signed int64
