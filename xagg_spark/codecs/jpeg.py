"""Baseline JPEG (ITU-T T.81) grayscale codec, pure numpy + stdlib.

No libjpeg exists in this environment, but the input_hint's ``fmt`` column
may carry jpeg tiles, so the engine implements the baseline sequential DCT
process from the public spec: 8x8 blocks, level shift, orthonormal 2-D DCT
(exactly the T.81 FDCT normalization), Annex-K luminance quantization
(quality-scaled), zigzag, DC-differential + AC run-length, canonical
Huffman with the Annex-K tables.  Markers: SOI, APP15 (private float-scale
metadata, ignored by other readers), DQT, SOF0, DHT, SOS, EOI — files are
structurally valid single-component baseline JPEGs; the decoder reads the
Huffman tables from DHT rather than assuming them.

Float tiles are scaled to uint8 via (vmin, vmax) carried in APP15 — same
convention as the PNG codec's tEXt chunk.  Lossy: PSNR at the default
quality is well above the 40 dB gate for smooth rasters.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table (row-major)
_QTAB_BASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)

# Annex K.3: DC luminance Huffman spec (BITS, HUFFVAL)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Annex K.3: AC luminance
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
assert sum(_AC_BITS) == len(_AC_VALS) == 162
assert sum(_DC_BITS) == len(_DC_VALS)


def _zigzag():
    """Standard zigzag scan order as (row, col) pairs."""
    out = []
    for d in range(15):
        cells = [(r, d - r) for r in range(max(0, d - 7), min(d, 7) + 1)]
        out.extend(cells if d % 2 else cells[::-1])
    return out


_ZZ = _zigzag()
_ZZ_IDX = np.array([r * 8 + c for r, c in _ZZ])

# orthonormal 8-point DCT-II matrix == T.81 FDCT normalization
_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = np.sqrt(1.0 / 8) if _u == 0 else np.sqrt(2.0 / 8)
        _M[_u, _x] = c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _huff_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 C.2): val -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)          # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)    # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1                  # unstuff
            else:
                b = 0            # marker hit: feed zeros (spec: pad region)
                self.pos -= 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _category(v: int):
    """(size s, offset bits) per T.81 F.1.2.1: negatives use v + 2^s - 1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _extend(bits: int, s: int) -> int:
    """Inverse of _category (T.81 F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _qtab(quality: int) -> np.ndarray:
    """IJG-style quality scaling of the base table (public convention)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_QTAB_BASE * s + 50) / 100.0)
    return np.clip(q, 1, 255)


def encode_jpeg_gray(arr: np.ndarray, quality: int = 96) -> bytes:
    """Encode a (h, w) float array as a baseline grayscale JPEG; the
    float<->uint8 scale rides in APP15 (key 'xagg_scale')."""
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape
    finite = arr[np.isfinite(arr)]
    vmin = float(finite.min()) if finite.size else 0.0
    vmax = float(finite.max()) if finite.size else 1.0
    scale = (vmax - vmin) or 1.0
    # +-inf positions are carried (and restored to NaN) by the APP15 nan
    # mask exactly like NaN, so clamp them to vmin here too — an unclamped
    # inf would overflow the int32 quantized coefficients and corrupt every
    # other pixel in its 8x8 block.
    u8 = np.round((np.nan_to_num(arr, nan=vmin, posinf=vmin, neginf=vmin)
                   - vmin) / scale * 255.0)

    ph, pw = -h % 8, -w % 8
    img = np.pad(u8, ((0, ph), (0, pw)), mode="edge") - 128.0
    H, W = img.shape
    blocks = (img.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
                 .reshape(-1, 8, 8))
    coef = np.einsum("ux,nxy,vy->nuv", _M, blocks, _M)
    q = _qtab(quality)
    quant = np.round(coef / q).astype(np.int32)
    zz = quant.reshape(-1, 64)[:, _ZZ_IDX]

    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for blk in zz:
        s, bits = _category(int(blk[0]) - prev_dc)
        prev_dc = int(blk[0])
        c, ln = dc_codes[s]
        bw.write(c, ln)
        if s:
            bw.write(bits, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]         # ZRL
                bw.write(c, ln)
                run -= 16
            s, bits = _category(v)
            c, ln = ac_codes[(run << 4) | s]
            bw.write(c, ln)
            bw.write(bits, s)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]             # EOB
            bw.write(c, ln)
    entropy = bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    meta = f"xagg_scale\x00{vmin!r},{vmax!r}".encode()
    segs = [seg(0xEF, meta)]
    nan_mask = ~np.isfinite(arr)
    if nan_mask.any():
        import zlib
        segs.append(seg(0xEF, b"xagg_nanmask\x00"
                        + zlib.compress(np.packbits(nan_mask).tobytes())))
    qz = bytes([0]) + bytes(int(q.reshape(-1)[_ZZ_IDX[i]]) for i in range(64))
    dht = (bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
           + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (b"\xff\xd8" + b"".join(segs) + seg(0xDB, qz) + seg(0xC0, sof)
            + seg(0xC4, dht) + seg(0xDA, sos) + entropy + b"\xff\xd9")


def decode_jpeg_gray(buf: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG produced by any encoder using one
    Huffman pair + one quant table (tables are read from the stream)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs, huff_specs = {}, {}          # huff_specs[(class, table_id)]
    comp_tq, scan_td, scan_ta = 0, 0, 0
    h = w = None
    vmin, vmax = 0.0, 255.0
    nanbits = None
    entropy_start = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad marker stream")
        marker = buf[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", buf[pos + 2:pos + 4])
        payload = buf[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xEF and payload.startswith(b"xagg_scale\x00"):
            vmin, vmax = (float(x) for x in
                          payload.split(b"\x00", 1)[1].decode().split(","))
        elif marker == 0xEF and payload.startswith(b"xagg_nanmask\x00"):
            import zlib
            nanbits = zlib.decompress(payload.split(b"\x00", 1)[1])
        elif marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                n = 64 * (2 if pq else 1)
                raw = payload[p + 1:p + 1 + n]
                tab = np.zeros(64)
                vals = (np.frombuffer(raw, dtype=">u2") if pq
                        else np.frombuffer(raw, dtype=np.uint8))
                tab[_ZZ_IDX] = vals
                qtabs[tq] = tab.reshape(8, 8)
                p += 1 + n
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17:p + 17 + nv])
                huff_specs[(tc, th)] = (bits, vals)
                p += 17 + nv
        elif marker == 0xC0:
            h, w = struct.unpack(">HH", payload[1:5])
            if payload[0] != 8 or payload[5] != 1:
                raise ValueError("only 8-bit single-component baseline")
            comp_tq = payload[8]        # component quant-table id (Tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) supported")
        elif marker == 0xDA:
            # SOS: Ns(1) [Cs, Td<<4|Ta]*Ns Ss Se AhAl — honour the declared
            # entropy-table ids (a valid foreign encoder may use id 1).
            scan_td, scan_ta = payload[2] >> 4, payload[2] & 0xF
            entropy_start = pos
            break
    dc_spec = huff_specs.get((0, scan_td))
    ac_spec = huff_specs.get((1, scan_ta))
    if entropy_start is None or h is None or dc_spec is None or ac_spec is None:
        raise ValueError("truncated JPEG")

    def _decode_tree(spec):
        code_map = {}
        code = 0
        k = 0
        bits, vals = spec
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                code_map[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        return code_map

    dc_map, ac_map = _decode_tree(dc_spec), _decode_tree(ac_spec)
    br = _BitReader(buf[entropy_start:])

    def read_huff(cmap):
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.bit()
            length += 1
            v = cmap.get((length, code))
            if v is not None:
                return v
        raise ValueError("bad Huffman code")

    if comp_tq not in qtabs:
        raise ValueError(f"quant table {comp_tq} declared in SOF not defined")
    q = qtabs[comp_tq]
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((nby * 8, nbx * 8))
    prev_dc = 0
    for by in range(nby):
        for bx in range(nbx):
            zz = np.zeros(64, dtype=np.float64)
            s = read_huff(dc_map)
            prev_dc += _extend(br.bits(s), s)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_huff(ac_map)
                r, s = rs >> 4, rs & 0xF
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += r
                zz[k] = _extend(br.bits(s), s)
                k += 1
            blk = np.zeros(64)
            blk[_ZZ_IDX] = zz
            coef = blk.reshape(8, 8) * q
            out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
                _M.T @ coef @ _M
    u8 = np.clip(out[:h, :w] + 128.0, 0, 255)
    arr = (u8 / 255.0 * (vmax - vmin) + vmin).astype(np.float32)
    if nanbits is not None:
        mask = np.unpackbits(np.frombuffer(nanbits, dtype=np.uint8),
                             count=h * w).reshape(h, w).astype(bool)
        arr = np.where(mask, np.float32(np.nan), arr)
    return arr
