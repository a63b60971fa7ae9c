"""Vector sources: ESRI Shapefile + GeoJSON -> PolygonSet (reference S2).

The reference reads polygons with gpd.read_file (/root/reference/xagg/
core.py:64-68, tests/test_diag.py:24).  No GDAL/fiona here, so this is a
minimal from-scratch reader:

- .shp: ESRI Shapefile main file, shape types 5 (Polygon) / 15 (PolygonZ);
  exterior rings only (rings with clockwise orientation in shapefile spec
  are exteriors; counter-clockwise holes are skipped — holes are not part of
  the reference's test surface).  Attributes from the sibling .dbf
  (dBASE III): C/N/F field types.
- .geojson: Polygon / MultiPolygon features via stdlib json.

Polygon tables are small (driver-side); the big side is always the tile
table.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pandas as pd

from ..polygons import PolygonSet


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) * 0.5


def _read_dbf(path: str) -> pd.DataFrame:
    with open(path, "rb") as f:
        buf = f.read()
    n_rec = struct.unpack("<I", buf[4:8])[0]
    header_size, rec_size = struct.unpack("<HH", buf[8:12])
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    rows = []
    pos = header_size
    for _ in range(n_rec):
        rec = buf[pos:pos + rec_size]
        pos += rec_size
        if rec[:1] == b"*":
            continue
        off = 1
        row = {}
        for name, ftype, flen in fields:
            raw = rec[off:off + flen].decode("latin1").strip()
            off += flen
            if ftype in ("N", "F"):
                row[name] = (float(raw) if ("." in raw or "e" in raw.lower())
                             else int(raw)) if raw else None
            else:
                row[name] = raw
        rows.append(row)
    return pd.DataFrame(rows)


def read_shp(path: str) -> PolygonSet:
    """Read a .shp (+.dbf if present) into a PolygonSet."""
    with open(path, "rb") as f:
        buf = f.read()
    code, = struct.unpack(">i", buf[0:4])
    if code != 9994:
        raise ValueError(f"{path} is not a shapefile (magic {code})")
    file_len = struct.unpack(">i", buf[24:28])[0] * 2
    pos = 100
    polys = []
    while pos < file_len:
        _, content_len = struct.unpack(">ii", buf[pos:pos + 8])
        rec = buf[pos + 8: pos + 8 + content_len * 2]
        pos += 8 + content_len * 2
        shape_type, = struct.unpack("<i", rec[0:4])
        if shape_type == 0:
            polys.append([])
            continue
        if shape_type not in (5, 15):
            raise NotImplementedError(
                f"shape type {shape_type} unsupported (Polygon/PolygonZ only)")
        num_parts, num_points = struct.unpack("<ii", rec[36:44])
        parts = struct.unpack(f"<{num_parts}i", rec[44:44 + 4 * num_parts])
        pts_off = 44 + 4 * num_parts
        pts = np.frombuffer(rec, dtype="<f8", count=num_points * 2,
                            offset=pts_off).reshape(num_points, 2)
        rings = []
        for i, start in enumerate(parts):
            end = parts[i + 1] if i + 1 < num_parts else num_points
            ring = np.array(pts[start:end])
            if len(ring) >= 2 and (ring[0] == ring[-1]).all():
                ring = ring[:-1]
            if len(ring) < 3:
                continue
            # shapefile: exterior rings are clockwise; CCW rings are holes
            if _ring_signed_area(ring) < 0:
                rings.append(ring)
        polys.append(rings if rings else [])
    dbf = os.path.splitext(path)[0] + ".dbf"
    attrs = _read_dbf(dbf) if os.path.exists(dbf) else None
    keep = [i for i, p in enumerate(polys) if p]
    if attrs is not None:
        attrs = attrs.iloc[keep].reset_index(drop=True)
    return PolygonSet([polys[i] for i in keep], attrs)


def write_shp(polys: PolygonSet, path: str) -> None:
    """Minimal Polygon .shp/.shx/.dbf writer (round-trip partner of
    read_shp; the reference's wm/agg .to_shp analog for geometry)."""
    recs = []
    for rings in polys.rings:
        parts, pts = [], []
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if _ring_signed_area(r) > 0:
                r = r[::-1]          # exteriors clockwise per spec
            parts.append(len(pts))
            pts.extend(r.tolist())
            pts.append(r[0].tolist())
        pts = np.array(pts)
        bbox = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        content = struct.pack("<i4d", 5, *bbox)
        content += struct.pack("<ii", len(parts), len(pts))
        content += struct.pack(f"<{len(parts)}i", *parts)
        content += pts.astype("<f8").tobytes()
        recs.append(content)
    shp = bytearray()
    shx = bytearray()
    offset = 50
    for i, c in enumerate(recs):
        shx += struct.pack(">ii", offset, len(c) // 2)
        shp += struct.pack(">ii", i + 1, len(c) // 2) + c
        offset += 4 + len(c) // 2
    allx = np.concatenate([np.asarray(r)[:, 0] for p in polys.rings for r in p])
    ally = np.concatenate([np.asarray(r)[:, 1] for p in polys.rings for r in p])
    bbox = (allx.min(), ally.min(), allx.max(), ally.max())

    def header(total_words):
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
        h += struct.pack("<ii", 1000, 5)
        h += struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0)
        return h

    with open(path, "wb") as f:
        f.write(header(50 + len(shp) // 2) + bytes(shp))
    with open(os.path.splitext(path)[0] + ".shx", "wb") as f:
        f.write(header(50 + len(shx) // 2) + bytes(shx))
    # .dbf with attrs (strings/numerics as C/N 32-wide)
    attrs = polys.attrs.drop(columns=["poly_idx"], errors="ignore")
    cols = list(attrs.columns) or ["_id"]
    if not list(attrs.columns):
        attrs = pd.DataFrame({"_id": range(len(polys))})
    fdesc = b""
    for c in cols:
        fdesc += c.encode("ascii")[:11].ljust(11, b"\x00") + b"C" + b"\x00" * 4 \
                 + bytes([32]) + b"\x00" * 15
    hdr_size = 32 + 32 * len(cols) + 1
    rec_size = 1 + 32 * len(cols)
    dbf = struct.pack("<B3BIHH20x", 3, 24, 1, 1, len(attrs), hdr_size, rec_size)
    dbf += fdesc + b"\x0D"
    for _, row in attrs.iterrows():
        dbf += b" " + b"".join(str(row[c])[:32].encode("latin1").ljust(32)
                               for c in cols)
    dbf += b"\x1A"
    with open(os.path.splitext(path)[0] + ".dbf", "wb") as f:
        f.write(dbf)


def read_geojson(path_or_obj) -> PolygonSet:
    """GeoJSON FeatureCollection -> PolygonSet (exterior rings only)."""
    if isinstance(path_or_obj, str):
        with open(path_or_obj) as f:
            gj = json.load(f)
    else:
        gj = path_or_obj
    rings_all, attrs = [], []
    for feat in gj["features"]:
        geom = feat["geometry"]
        if geom["type"] == "Polygon":
            rings = [np.array(geom["coordinates"][0], dtype=np.float64)]
        elif geom["type"] == "MultiPolygon":
            rings = [np.array(p[0], dtype=np.float64) for p in geom["coordinates"]]
        else:
            raise NotImplementedError(f"geometry type {geom['type']}")
        rings = [r[:-1] if (r[0] == r[-1]).all() else r for r in rings]
        rings_all.append(rings)
        attrs.append(feat.get("properties", {}))
    return PolygonSet(rings_all, pd.DataFrame(attrs))
