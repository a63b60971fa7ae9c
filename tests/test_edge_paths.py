"""Remaining edge paths: explicit bounds (get_bnds no-op), corrupt
weightmap detection, LAEA (polar) overlap path."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from xagg_spark import read_wm, save_weightmap
from xagg_spark.grid import AxesGrid, GridSpec
from xagg_spark.operators import pixel_overlaps
from xagg_spark.polygons import PolygonSet, rect_ring


def test_explicit_bounds_respected(spark):
    # get_bnds: if bounds are present, do nothing
    # (/root/reference/tests/test_auxfuncs.py:101-108) — supply NON-half-
    # spacing bounds and check the overlap areas follow them
    ag = AxesGrid(lat=np.array([0.0, 1.0]), lon=np.array([0.0, 1.0]),
                  lat_bnds=np.array([[0.0, 0.4], [0.6, 1.0]]),   # gappy!
                  lon_bnds=np.array([[0.0, 0.4], [0.6, 1.0]]))
    polys = PolygonSet([rect_ring(0.0, 0.0, 0.4, 0.4)])  # exactly pixel 0
    wm = pixel_overlaps(spark, ag, polys)
    pdf = wm.overlaps.toPandas()
    assert len(pdf) == 1 and pdf.pix_idx.iloc[0] == 0
    assert np.isclose(pdf.rel_area.iloc[0], 1.0)


def test_corrupt_weightmap_detected(spark, tmp_path):
    grid = GridSpec(lat_edge=-1.0, lon_edge=-1.0, dlat=1.0, dlon=1.0,
                    nlat=2, nlon=2, tile_h=2, tile_w=2)
    wm = pixel_overlaps(spark, grid, PolygonSet([rect_ring(-1.0, -1.0, 1.0, 1.0)]))
    path = str(tmp_path / "wm")
    save_weightmap(wm, path)
    # tamper with the manifest row count
    mp = os.path.join(path, "_manifest.json")
    man = json.load(open(mp))
    man["lineage"]["total_rows"] += 5
    json.dump(man, open(mp, "w"))
    with pytest.raises(ValueError, match="corrupt"):
        read_wm(spark, path)


def test_polar_laea_overlaps(spark):
    # strictly-northern polygons -> EPSG:6931 (LAEA); everything routes
    # through the exact refine UDF (no CEA fast path) and rel_area still
    # normalizes to 1
    grid = GridSpec(lat_edge=70.0, lon_edge=-10.0, dlat=1.0, dlon=1.0,
                    nlat=10, nlon=20, tile_h=10, tile_w=20)
    polys = PolygonSet([rect_ring(-5.0, 72.0, 5.0, 78.0)],
                       pd.DataFrame({"name": ["arctic"]}))
    wm = pixel_overlaps(spark, grid, polys)
    assert wm.epsg == 6931
    pdf = wm.overlaps.toPandas()
    assert np.isclose(pdf.rel_area.sum(), 1.0)
    # interior pixels of equal lon-width shrink toward the pole: the same
    # 1-degree pixel at lat 77 is smaller than at lat 72
    a72 = pdf[(pdf.lat == 72.5) & (pdf.lon == 0.5)].rel_area.iloc[0]
    a77 = pdf[(pdf.lat == 77.5) & (pdf.lon == 0.5)].rel_area.iloc[0]
    assert a77 < a72


class _Ctr:
    def __init__(self):
        self.value = 0

    def add(self, n):
        self.value += n


def test_nonconvex_fallback_counter_fires(monkeypatch):
    """The refine counters must count non-convex-quad fallbacks.  Lat/lon-
    aligned pixels project to annular trapezoids (provably convex) in every
    EASE CRS, so the fallback is exercised by patching the projection to
    fold one pixel corner inward — proving the counter plumbing works if a
    pathological geometry ever reaches it."""
    from xagg_spark.operators import overlaps as ov

    real_forward = ov._ell.forward

    def folded(lon, lat, epsg):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        x, y = lon.copy(), lat.copy()
        fold = (lon == 1.0) & (lat == 1.0)     # corner C -> inside ABD
        x[fold], y[fold] = 0.4, 0.4
        return x, y

    monkeypatch.setattr(ov._ell, "forward", folded)
    try:
        ring = np.array([[0.2, 0.2], [3.0, 0.2], [3.0, 3.0]])
        ctr_b, ctr_nc = _Ctr(), _Ctr()
        refine = ov._refine_factory({0: [ring]}, ov._ell.EPSG_GLOBAL,
                                    {0: [1.0]}, counters=(ctr_b, ctr_nc))
        pdf = pd.DataFrame({"poly_idx": [0], "pix_idx": [0],
                            "lat": [0.5], "lon": [0.5],
                            "lat0": [0.0], "lat1": [1.0],
                            "lon0": [0.0], "lon1": [1.0]})
        list(refine(iter([pdf])))
        assert ctr_b.value == 1 and ctr_nc.value == 1
    finally:
        monkeypatch.setattr(ov._ell, "forward", real_forward)


def test_nonconvex_warning_threshold():
    from xagg_spark.operators.overlaps import _warn_nonconvex_fallback

    with pytest.warns(RuntimeWarning, match="NON-CONVEX"):
        _warn_nonconvex_fallback(100, 2)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        _warn_nonconvex_fallback(100, 1)      # at/below 1%: silent
        _warn_nonconvex_fallback(0, 0)


def test_real_polar_build_reports_zero_fallbacks(spark):
    """Real extreme-latitude grid: boundary pixels go through the batched
    clip (counter > 0) and NONE take the non-convex fallback — pinning the
    annular-trapezoid convexity argument with a live build."""
    grid = GridSpec(lat_edge=80.0, lon_edge=-40.0, dlat=0.5, dlon=1.0,
                    nlat=18, nlon=80, tile_h=18, tile_w=80)
    polys = PolygonSet([rect_ring(-33.3, 81.7, 29.1, 88.6)],
                       pd.DataFrame({"name": ["cap"]}))
    wm = pixel_overlaps(spark, grid, polys)
    assert wm.epsg == 6931
    assert wm.n_boundary_refined > 0
    assert wm.n_nonconvex_fallback == 0
