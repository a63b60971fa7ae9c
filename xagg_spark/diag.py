"""Overlap diagnostics (reference xagg/diag.py:14-148 analog).

The reference's ``diag_fig`` draws a matplotlib/cartopy figure of one
polygon's pixel overlaps.  Neither library exists in this environment, so
the engine renders the same information as a real image using its OWN
16-bit grayscale PNG codec (codecs.image): pixel intensity is the pixel's
rel_area (normalized to the polygon's max), the polygon boundary is traced
at full intensity, and non-overlapping pixels are NaN (carried in the PNG's
NaN-mask chunk).  The output opens in any PNG viewer.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from .grid import AxesGrid, GridSpec


def _grid_axes(grid):
    if isinstance(grid, GridSpec):
        ag = AxesGrid(grid.lat_axis(), grid.lon_axis()).with_bounds()
    else:
        ag = grid.with_bounds()
    return ag


def diag_fig(wm, poly_idx: int = 0, fn: str | None = None,
             pad_cells: int = 2) -> bytes:
    """Render one polygon's overlap raster to PNG bytes (optionally also
    written to ``fn``).  Driver-side: a single polygon's overlap rows are
    tiny relative to the weightmap."""
    from .codecs.image import encode_tile

    pdf = (wm.overlaps.filter(F.col("poly_idx") == int(poly_idx))
             .select("pix_idx", "rel_area").toPandas())
    if len(pdf) == 0:
        raise ValueError(f"polygon {poly_idx} has no overlaps")
    ag = _grid_axes(wm.grid)
    nlon = ag.nlon
    iy = (pdf["pix_idx"].to_numpy() // nlon).astype(int)
    ix = (pdf["pix_idx"].to_numpy() % nlon).astype(int)
    rel = pdf["rel_area"].to_numpy()

    y0 = max(int(iy.min()) - pad_cells, 0)
    y1 = min(int(iy.max()) + pad_cells, ag.nlat - 1)
    x0 = max(int(ix.min()) - pad_cells, 0)
    x1 = min(int(ix.max()) + pad_cells, nlon - 1)
    img = np.full((y1 - y0 + 1, x1 - x0 + 1), np.nan, dtype=np.float32)
    peak = float(rel.max()) or 1.0
    img[iy - y0, ix - x0] = rel / peak

    # trace the polygon boundary at full intensity (the reference overlays
    # the polygon edge on the pcolormesh)
    for ring in wm.polys.rings[int(poly_idx)]:
        a = np.asarray(ring)
        b = np.roll(a, -1, axis=0)
        for (lon_a, lat_a), (lon_b, lat_b) in zip(a, b):
            k = max(int(np.hypot(lon_b - lon_a, lat_b - lat_a) /
                        max(ag.lon[1] - ag.lon[0] if nlon > 1 else 1.0, 1e-9))
                    * 4, 2)
            ts = np.linspace(0.0, 1.0, k)
            lons = lon_a + ts * (lon_b - lon_a)
            lats = lat_a + ts * (lat_b - lat_a)
            giy = np.searchsorted(ag.lat_bnds[:, 1], lats)
            gix = np.searchsorted(ag.lon_bnds[:, 1], lons)
            ok = (giy >= y0) & (giy <= y1) & (gix >= x0) & (gix <= x1)
            img[giy[ok] - y0, gix[ok] - x0] = 1.0

    # flip so north is up in the rendered image
    png = encode_tile(img[::-1], "png")
    if fn:
        with open(fn, "wb") as f:
            f.write(png)
    return png
