"""Polygon clipping + area, pure numpy (no GEOS available in this env).

Reproduces the numerics of the reference's ``gpd.overlay(how='intersection')``
+ ``.area`` (/root/reference/xagg/core.py:488-497, 521): both sides are
projected to an EASE CRS first, the intersection is computed on straight
segments *in projected space*, and the area is the planar (shoelace) area of
the clipped polygon.

We clip the (arbitrary, possibly concave) user polygon against the pixel
rectangle with Sutherland-Hodgman.  In the cylindrical CRS (EPSG:6933) a
lat/lon-aligned pixel maps to an exact axis-aligned rectangle, so the clip
window is exactly convex and results are bit-comparable with GEOS up to
floating-point summation order.  In the polar LAEA CRSes the projected pixel
is a near-convex quad for any realistic pixel size; the same routine applies.
"""

from __future__ import annotations

import numpy as np


def shoelace_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Signed-magnitude planar polygon area (positive, like GEOS .area)."""
    if len(xs) < 3:
        return 0.0
    return float(abs(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys)) * 0.5)


def _ensure_ccw(pts: np.ndarray) -> np.ndarray:
    x, y = pts[:, 0], pts[:, 1]
    signed = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return pts if signed >= 0 else pts[::-1]


def clip_polygon_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip ``subject`` (N,2) by convex ``clip`` (M,2).

    Returns the clipped vertex ring (K,2); K<3 means empty intersection.
    """
    clip = _ensure_ccw(np.asarray(clip, dtype=np.float64))
    out = np.asarray(subject, dtype=np.float64)
    m = len(clip)
    for i in range(m):
        if len(out) == 0:
            break
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % m]
        ex, ey = bx - ax, by - ay
        # signed distance of each subject vertex to clip edge (>=0 inside, CCW)
        px, py = out[:, 0], out[:, 1]
        d = ex * (py - ay) - ey * (px - ax)
        nxt = np.roll(np.arange(len(out)), -1)
        new_pts = []
        for j in range(len(out)):
            k = nxt[j]
            dj, dk = d[j], d[k]
            if dj >= 0:
                new_pts.append(out[j])
                if dk < 0:
                    t = dj / (dj - dk)
                    new_pts.append(out[j] + t * (out[k] - out[j]))
            elif dk >= 0:
                t = dj / (dj - dk)
                new_pts.append(out[j] + t * (out[k] - out[j]))
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    return out


def clip_area(subject: np.ndarray, clip: np.ndarray) -> float:
    ring = clip_polygon_convex(subject, clip)
    if len(ring) < 3:
        return 0.0
    return shoelace_area(ring[:, 0], ring[:, 1])


def rect_rect_overlap_area_cea(plon0, plat0, plon1, plat1,
                               qlon0, qlat0, qlon1, qlat1):
    """Vectorized exact EPSG:6933 overlap area of two lat/lon rectangles.

    Fast path used when the user polygon is an axis-aligned rectangle
    (the synthetic-benchmark / oracle case); closed form, no clipping loop.
    """
    from .ellipsoid import cea_band_area

    lon0 = np.maximum(plon0, qlon0)
    lon1 = np.minimum(plon1, qlon1)
    lat0 = np.maximum(plat0, qlat0)
    lat1 = np.minimum(plat1, qlat1)
    area = cea_band_area(lat0, lat1, lon0, lon1)
    empty = (lon1 <= lon0) | (lat1 <= lat0)
    return np.where(empty, 0.0, area)
