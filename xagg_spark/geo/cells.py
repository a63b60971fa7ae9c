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


def cover_polygon(lons: np.ndarray, lats: np.ndarray, res: int,
                  dilate: bool = False, pads=None) -> np.ndarray:
    """Cell cover of a polygon ring, fully vectorized (no per-cell Python):

    cover = { cells whose CENTER is inside the polygon  (interior, PIP on
              the whole center grid at once) }
          ∪ { cells any polygon EDGE passes through     (boundary, per-edge
              conservative rasterization — walk the edge's x-columns and
              mark the y-rows its segment spans in each column) }

    Slightly conservative on the boundary (may include a touching neighbor
    cell) — harmless: refine computes exact areas and drops empties.  Cost
    is O(interior cells) numpy + O(perimeter cells) per edge, which keeps
    domain-scale polygons (10^5+ cells) in milliseconds instead of minutes.
    """
    n = 1 << res
    cw = 360.0 / n   # cell width (lon)
    ch = 180.0 / n   # cell height (lat)
    maxpad = float(np.max(pads)) if pads is not None and len(pads) else 0.0
    lon0, lon1 = float(np.min(lons)) - maxpad, float(np.max(lons)) + maxpad
    lat0, lat1 = float(np.min(lats)) - maxpad, float(np.max(lats)) + maxpad
    x0, x1 = cell_range(lon0, lon1, res, True)
    y0, y1 = cell_range(lat0, lat1, res, False)
    nx, ny = x1 - x0 + 1, y1 - y0 + 1

    # interior: point-in-polygon for every cell center (vectorized)
    cx = -180.0 + (np.arange(x0, x1 + 1) + 0.5) * cw
    cy = -90.0 + (np.arange(y0, y1 + 1) + 0.5) * ch
    GX, GY = np.meshgrid(cx, cy, indexing="ij")      # (nx, ny)
    ex0, ey0 = lons, lats
    ex1, ey1 = np.roll(lons, -1), np.roll(lats, -1)
    inside = np.zeros((nx, ny), dtype=bool)
    P = GX.ravel()[:, None], GY.ravel()[:, None]
    px, py = P
    crossing = np.zeros(px.shape[0], dtype=np.int64)
    CH = max(1024, (1 << 23) // max(len(lons), 1))
    for s in range(0, px.shape[0], CH):
        e = min(s + CH, px.shape[0])
        ya, yb = ey0[None, :], ey1[None, :]
        xa, xb = ex0[None, :], ex1[None, :]
        cy_ = py[s:e]
        cx_ = px[s:e]
        cross = (ya > cy_) != (yb > cy_)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = xa + (cy_ - ya) * (xb - xa) / (yb - ya)
        crossing[s:e] = (cross & (xi > cx_)).sum(axis=1)
    inside = (crossing % 2).astype(bool).reshape(nx, ny)

    mark = inside.copy()

    mark |= _rasterize_edges(lons, lats, pads, res, x0, x1, y0, y1)

    if dilate:
        # 1-ring dilation on the boolean grid (pad, then 8-neighbor OR):
        # guarantees a pixel assigned to its CENTER cell is never missed
        # when cell size >= pixel size (pixel pokes <= half a cell out)
        d = _dilate1(mark)
        kx, ky = np.nonzero(d)
        kx, ky = kx - 1 + x0, ky - 1 + y0
        ok = (ky >= 0) & (ky < n)
        kx, ky = kx[ok] % n, ky[ok]
        if len(kx) == 0:
            return np.zeros(0, dtype=np.int64)
        return np.unique(cell_id(res, kx, ky))
    kx, ky = np.nonzero(mark)
    if len(kx) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.unique(cell_id(res, (kx + x0) % n, ky + y0))


def _dilate1(mark: np.ndarray) -> np.ndarray:
    """8-neighbor dilation with 1-cell padding; output is padded by 1."""
    nx, ny = mark.shape
    pad = np.zeros((nx + 2, ny + 2), dtype=bool)
    pad[1:-1, 1:-1] = mark
    d = pad.copy()
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            d |= np.roll(np.roll(pad, dx, axis=0), dy, axis=1)
    return d


def _erode1(mark: np.ndarray) -> np.ndarray:
    """8-neighbor erosion (True only where the full 3x3 block is True)."""
    nx, ny = mark.shape
    pad = np.zeros((nx + 2, ny + 2), dtype=bool)
    pad[1:-1, 1:-1] = mark
    e = pad.copy()
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            e &= np.roll(np.roll(pad, dx, axis=0), dy, axis=1)
    return e[1:-1, 1:-1]


def cover_polygon_classified(rings, res: int, pads_list=None):
    """Dilated cover + 'safe interior' classification over ALL rings of one
    polygon (exterior(s), disjoint parts, AND holes) at once.

    rings: list of (N,2) lon/lat vertex arrays.  pads_list: per-ring arrays
    of per-edge conservative curve pads (degrees).

    Returns (cell_ids int64[], full bool[]).  Interior = even-odd crossing
    parity over the UNION of all rings' edges — a point inside a hole has
    even parity, so hole interiors are correctly NOT interior (the
    reference's GEOS geometries subtract interior rings).  A cell is FULL
    iff it and all 8 neighbors have centers inside the region and no ring
    edge (hole edges included) passes through them — then any pixel whose
    center falls in the cell (pixel <= cell size per axis) lies entirely
    inside the polygon-with-holes, so its overlap is the whole pixel,
    computable in closed form JVM-side with no clipping.
    """
    rings = [np.asarray(r, dtype=np.float64) for r in rings]
    if pads_list is None:
        pads_list = [None] * len(rings)
    n = 1 << res
    cw, ch = 360.0 / n, 180.0 / n
    maxpad = max((float(np.max(p)) for p in pads_list
                  if p is not None and len(p)), default=0.0)
    all_lon = np.concatenate([r[:, 0] for r in rings])
    all_lat = np.concatenate([r[:, 1] for r in rings])
    lon0, lon1 = float(all_lon.min()) - maxpad, float(all_lon.max()) + maxpad
    lat0, lat1 = float(all_lat.min()) - maxpad, float(all_lat.max()) + maxpad
    x0, x1 = cell_range(lon0, lon1, res, True)
    y0, y1 = cell_range(lat0, lat1, res, False)
    nx, ny = x1 - x0 + 1, y1 - y0 + 1

    # concatenated edge list over every ring (rolls stay ring-local)
    ex0 = all_lon
    ey0 = all_lat
    ex1 = np.concatenate([np.roll(r[:, 0], -1) for r in rings])
    ey1 = np.concatenate([np.roll(r[:, 1], -1) for r in rings])

    cx = -180.0 + (np.arange(x0, x1 + 1) + 0.5) * cw
    cy = -90.0 + (np.arange(y0, y1 + 1) + 0.5) * ch
    GX, GY = np.meshgrid(cx, cy, indexing="ij")
    px = GX.ravel()[:, None]
    py = GY.ravel()[:, None]
    crossing = np.zeros(px.shape[0], dtype=np.int64)
    CHK = max(1024, (1 << 23) // max(len(ex0), 1))
    for s in range(0, px.shape[0], CHK):
        e = min(s + CHK, px.shape[0])
        ya, yb = ey0[None, :], ey1[None, :]
        xa, xb = ex0[None, :], ex1[None, :]
        cross = (ya > py[s:e]) != (yb > py[s:e])
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = xa + (py[s:e] - ya) * (xb - xa) / (yb - ya)
        crossing[s:e] = (cross & (xi > px[s:e])).sum(axis=1)
    inside = (crossing % 2).astype(bool).reshape(nx, ny)

    edge = np.zeros((nx, ny), dtype=bool)
    for r, p in zip(rings, pads_list):
        edge |= _rasterize_edges(r[:, 0], r[:, 1], p, res, x0, x1, y0, y1)

    mark = inside | edge
    cover = _dilate1(mark)                       # padded (+1)
    fully_inside = inside & ~edge
    safe = _erode1(fully_inside)                 # unpadded
    safe_pad = np.zeros_like(cover)
    safe_pad[1:-1, 1:-1] = safe

    kx, ky = np.nonzero(cover)
    full = safe_pad[kx, ky]
    kx, ky = kx - 1 + x0, ky - 1 + y0
    ok = (ky >= 0) & (ky < n)
    kx, ky, full = kx[ok] % n, ky[ok], full[ok]
    if len(kx) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=bool)
    ids = cell_id(res, kx, ky)
    uids, inv = np.unique(ids, return_inverse=True)
    # a physical cell reached twice (lon wrap) is FULL only if every window
    # instance says so (conservative: edge wins over full)
    ufull = np.ones(len(uids), dtype=bool)
    np.minimum.at(ufull, inv, full)
    return uids, ufull


def _rasterize_edges(lons, lats, pads, res, x0, x1, y0, y1) -> np.ndarray:
    """Conservative raster of ring edges onto the (x0..x1, y0..y1) cell
    window, each edge expanded by its curve pad (degrees): the true
    projected-straight edge curve stays within pad of the lon/lat chord
    (geo.ellipsoid.edge_curve_pads), so every cell the true boundary touches
    gets marked."""
    n = 1 << res
    cw, ch = 360.0 / n, 180.0 / n
    nx, ny = x1 - x0 + 1, y1 - y0 + 1
    mark = np.zeros((nx, ny), dtype=bool)
    ex0, ey0 = lons, lats
    ex1, ey1 = np.roll(lons, -1), np.roll(lats, -1)
    if pads is None:
        pads = np.zeros(len(lons))
    for k in range(len(lons)):
        ax, ay, bx, by = ex0[k], ey0[k], ex1[k], ey1[k]
        pad = float(pads[k])
        gx0 = int(np.floor((min(ax, bx) - pad + 180.0) / cw))
        gx1 = int(np.floor((max(ax, bx) + pad + 180.0) / cw))
        for gx in range(max(gx0, x0), min(gx1, x1) + 1):
            # segment y-range within this column (clip segment to the
            # column lon span widened by pad; conservative)
            cxa = -180.0 + gx * cw - pad
            cxb = cxa + cw + 2.0 * pad
            if ax == bx:
                ylo, yhi = min(ay, by), max(ay, by)
            else:
                t0 = np.clip((cxa - ax) / (bx - ax), 0.0, 1.0)
                t1 = np.clip((cxb - ax) / (bx - ax), 0.0, 1.0)
                ya_ = ay + t0 * (by - ay)
                yb_ = ay + t1 * (by - ay)
                ylo, yhi = min(ya_, yb_), max(ya_, yb_)
            gy0 = max(int(np.floor((ylo - pad + 90.0) / ch)), y0)
            gy1 = min(int(np.floor((yhi + pad + 90.0) / ch)), y1)
            if gy1 >= gy0:
                mark[gx - x0, gy0 - y0:gy1 - y0 + 1] = True
    return mark
