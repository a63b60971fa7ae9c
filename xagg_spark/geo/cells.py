"""Hierarchical lon/lat cell index (H3/S2 stand-in), pure numpy.

Neither h3 nor s2 bindings exist in this environment, so the engine uses its
own deterministic equal-angle cell grid: at resolution ``r`` the world is a
2^r x 2^r grid over lon [-180,180) x lat [-90,90).  A cell id packs
(res, ix, iy) into a single int64, so it joins/partitions like any long key.

This plays the same architectural role as the H3 cover in SURVEY.md §2 (G8,
J1a): polygons are covered by a set of cells (broadcast side), pixels map to
the cells their bbox touches (fact side), and the overlap join is a plain
equi-join on cell_id followed by exact refinement.  Cell ids are derived
purely from coordinates -> deterministic under any parallelism.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 24


def cell_id(res: int, ix, iy):
    """Pack (res, ix, iy) -> int64.  ix in [0, 2^res), iy in [0, 2^res)."""
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    return (np.int64(res) << np.int64(58)) | (ix << np.int64(29)) | iy


def cell_of(lon, lat, res: int):
    """Cell containing a point. lon wrapped into [-180, 180)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = 1 << res
    ix = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    ix = np.clip(ix % n, 0, n - 1)
    iy = np.clip(iy, 0, n - 1)
    return cell_id(res, ix, iy)


def cell_range(lo, hi, res: int, is_lon: bool):
    """Index range [i0, i1] of cells touched by the interval [lo, hi]."""
    n = 1 << res
    span = 360.0 if is_lon else 180.0
    off = 180.0 if is_lon else 90.0
    i0 = int(np.floor((lo + off) / span * n))
    i1 = int(np.ceil((hi + off) / span * n)) - 1
    if not is_lon:
        i0 = max(i0, 0)
        i1 = min(i1, n - 1)
    return i0, max(i1, i0)


def cover_bbox(lon0: float, lat0: float, lon1: float, lat1: float, res: int) -> np.ndarray:
    """All cell ids whose cell rectangle intersects the bbox (lon not wrapped:
    caller splits antimeridian-crossing boxes first)."""
    n = 1 << res
    x0, x1 = cell_range(lon0, lon1, res, True)
    y0, y1 = cell_range(lat0, lat1, res, False)
    xs = np.arange(x0, x1 + 1, dtype=np.int64) % n
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return np.unique(cell_id(res, gx.ravel(), gy.ravel()))


def pick_resolution(pixel_deg: float, target_pixels_per_cell: float = 4.0) -> int:
    """Choose a resolution so one cell holds ~target_pixels_per_cell pixels
    per axis-squared — keeps pixel->cell fan-out ~1 while the polygon cover
    stays small.  Clamped to [0, MAX_RES]."""
    if pixel_deg <= 0:
        return 6
    cell_deg = pixel_deg * np.sqrt(target_pixels_per_cell)
    res = int(np.floor(np.log2(360.0 / cell_deg)))
    return int(np.clip(res, 0, MAX_RES))


def cover_polygon(lons: np.ndarray, lats: np.ndarray, res: int) -> np.ndarray:
    """Cell cover of a polygon ring: bbox cells filtered to those whose cell
    rectangle actually intersects the polygon (edge test + containment), so
    the broadcast prefilter stays tight for large/skewed polygons."""
    from .clip import clip_polygon_convex

    lon0, lon1 = float(np.min(lons)), float(np.max(lons))
    lat0, lat1 = float(np.min(lats)), float(np.max(lats))
    n = 1 << res
    x0, x1 = cell_range(lon0, lon1, res, True)
    y0, y1 = cell_range(lat0, lat1, res, False)
    subject = np.stack([lons, lats], axis=1)
    keep_x, keep_y = [], []
    for ix in range(x0, x1 + 1):
        clon0 = -180.0 + ix * 360.0 / n
        clon1 = clon0 + 360.0 / n
        for iy in range(y0, y1 + 1):
            clat0 = -90.0 + iy * 180.0 / n
            clat1 = clat0 + 180.0 / n
            rect = np.array([[clon0, clat0], [clon1, clat0], [clon1, clat1], [clon0, clat1]])
            ring = clip_polygon_convex(subject, rect)
            if len(ring) >= 3:
                keep_x.append(ix % n)
                keep_y.append(iy)
    if not keep_x:
        return np.zeros(0, dtype=np.int64)
    return np.unique(cell_id(res, np.asarray(keep_x), np.asarray(keep_y)))
