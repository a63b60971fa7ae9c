"""End-to-end golden tests vs /root/reference/tests/test_core.py.

The reference feeds xarray grids; here the same grids arrive as encoded image
tiles (input_hint), flow through decode -> cell join -> refine -> normalize ->
weighted mean, and must reproduce the reference's hardcoded expectations.
"""

import numpy as np
import pandas as pd
import pytest

from xagg_spark.codecs import encode_tile, phash64
from xagg_spark.grid import GridSpec
from xagg_spark.operators import (NoOverlapError, aggregate, pixel_overlaps,
                                  tiles_to_pixels)
from xagg_spark.polygons import PolygonSet, rect_ring

# 2x2 grid, centers lat/lon = [0,1], bounds [-0.5,0.5],[0.5,1.5]
GRID = GridSpec(lat_edge=-0.5, lon_edge=-0.5, dlat=1.0, dlon=1.0,
                nlat=2, nlon=2, tile_h=2, tile_w=2)


def _ref_values(t):
    """Reference fixture: test[lon, lat, time] = arange(1,13).reshape(2,2,3)
    (/root/reference/tests/test_core.py:276-282) -> tile array[iy, ix]."""
    vals = np.arange(1, 13).reshape(2, 2, 3)  # (lon, lat, time)
    return vals[:, :, t].T.astype(np.float32)  # -> (lat, lon)


def _image_df(spark, fmt="raw32", tiles=None):
    rows = []
    for t in range(3):
        arr = tiles(t) if tiles else _ref_values(t)
        rows.append({"image_id": f"tile_test_{t:04d}_00000_00000",
                     "bytes": encode_tile(arr, fmt), "w": 2, "h": 2,
                     "fmt": fmt, "caption": f"test tile t={t}",
                     "phash": phash64(arr)})
    return spark.createDataFrame(pd.DataFrame(rows))


def _agg_values(out_pdf, poly_idx=0):
    sub = out_pdf[out_pdf.poly_idx == poly_idx].sort_values("t")
    return sub["value"].to_numpy()


def test_overlaps_one_pixel(spark):
    # /root/reference/tests/test_core.py:296-310: unit square on one pixel
    polys = PolygonSet([rect_ring(-0.5, -0.5, 0.5, 0.5)],
                       pd.DataFrame({"name": ["test"]}))
    wm = pixel_overlaps(spark, GRID, polys)
    pdf = wm.overlaps.toPandas()
    assert len(pdf) == 1
    assert pdf.pix_idx.iloc[0] == 0
    assert np.isclose(pdf.rel_area.iloc[0], 1.0)


def test_overlaps_fraction_of_pixel(spark):
    # :324-338 sub-pixel square -> still rel_area [[1.0]]
    polys = PolygonSet([rect_ring(-0.5, -0.5, 0.0, 0.0)])
    wm = pixel_overlaps(spark, GRID, polys)
    pdf = wm.overlaps.toPandas()
    assert len(pdf) == 1 and np.isclose(pdf.rel_area.iloc[0], 1.0)


def test_overlaps_multiple_pixels_complete(spark):
    # :351-367 golden [0.250019, 0.250019, 0.249981, 0.249981]
    polys = PolygonSet([rect_ring(-0.5, -0.5, 1.5, 1.5)])
    wm = pixel_overlaps(spark, GRID, polys)
    pdf = wm.overlaps.toPandas().sort_values("pix_idx")
    assert list(pdf.pix_idx) == [0, 1, 2, 3]
    assert np.allclose(pdf.rel_area, [0.250019, 0.250019, 0.249981, 0.249981],
                       atol=1e-6)


def test_overlaps_multiple_pixels_partial(spark):
    # :381-397 golden [0.250009, 0.250009, 0.249991, 0.249991]
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0)])
    wm = pixel_overlaps(spark, GRID, polys)
    pdf = wm.overlaps.toPandas().sort_values("pix_idx")
    assert np.allclose(pdf.rel_area, [0.250009, 0.250009, 0.249991, 0.249991],
                       atol=1e-6)


def test_no_overlap_raises(spark):
    # :217-235 far-away polygon -> NoOverlapError
    polys = PolygonSet([rect_ring(50.0, 50.0, 51.0, 51.0)])
    with pytest.raises(NoOverlapError):
        pixel_overlaps(spark, GRID, polys)


def test_aggregate_basic_golden(spark):
    # /root/reference/tests/test_core.py:463-485:
    # polygon (0,0)-(1,1) over the 2x2x3 grid -> [5.4999, 6.4999, 7.4999]
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0)],
                       pd.DataFrame({"name": ["test"]}))
    wm = pixel_overlaps(spark, GRID, polys)
    pix = tiles_to_pixels(_image_df(spark), GRID)
    out = aggregate(pix, wm).toPandas()
    assert np.allclose(_agg_values(out), [5.4999, 6.4999, 7.4999], atol=1e-4)
    assert set(out.columns) >= {"poly_idx", "name", "var", "t", "value"}


def test_aggregate_two_polygons(spark):
    # :562-584: second poly [(-1,0)..(0,1)] -> [2.4999, 3.4999, 4.4999]
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0),
                        rect_ring(-1.0, 0.0, 0.0, 1.0)])
    wm = pixel_overlaps(spark, GRID, polys)
    pix = tiles_to_pixels(_image_df(spark), GRID)
    out = aggregate(pix, wm).toPandas()
    assert np.allclose(_agg_values(out, 0), [5.4999, 6.4999, 7.4999], atol=1e-4)
    assert np.allclose(_agg_values(out, 1), [2.4999, 3.4999, 4.4999], atol=1e-4)


def test_aggregate_with_mask_weights(spark):
    # :595-619: weights [[1,1],[0,0]] (lat0 row on) -> exactly [4, 5, 6]
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0)])
    weights = pd.DataFrame({"pix_idx": [0, 1, 2, 3],
                            "weight": [1.0, 1.0, 0.0, 0.0]})
    wm = pixel_overlaps(spark, GRID, polys, weights_pdf=weights)
    pix = tiles_to_pixels(_image_df(spark), GRID)
    out = aggregate(pix, wm).toPandas()
    assert np.allclose(_agg_values(out), [4.0, 5.0, 6.0], atol=1e-7)


def test_aggregate_all_nan(spark):
    # :798-830: all-NaN variable -> NaN aggregate
    def tiles(t):
        return np.full((2, 2), np.nan, dtype=np.float32)
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0)])
    wm = pixel_overlaps(spark, GRID, polys)
    pix = tiles_to_pixels(_image_df(spark, fmt="raw32", tiles=tiles), GRID)
    out = aggregate(pix, wm).toPandas()
    assert np.isnan(_agg_values(out)).all()


def test_aggregate_nan_renormalize(spark):
    # :832-868: lat=1 row all-NaN -> weights renormalize -> [4, 5, 6] (from
    # remaining lat=0 pixels; exact because renormalization is within-band)
    def tiles(t):
        arr = _ref_values(t)
        arr[1, :] = np.nan  # iy=1 (lat=1) all NaN at every t
        return arr
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0)])
    wm = pixel_overlaps(spark, GRID, polys)
    pix = tiles_to_pixels(_image_df(spark, fmt="raw32", tiles=tiles), GRID)
    out = aggregate(pix, wm).toPandas()
    assert np.allclose(_agg_values(out), [4.0, 5.0, 6.0], atol=1e-7)


def test_aggregate_zero_overlap_polygon_gets_nan(spark):
    # J3 outer-merge semantics: a polygon with no overlap stays in the
    # result with NaN values (core.py:533-538, 796)
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0),
                        rect_ring(-0.5, -0.5, 1.5, 1.5)])
    wm = pixel_overlaps(spark, GRID, polys)
    # fake a wm whose second polygon had no overlaps by filtering
    wm.overlaps = wm.overlaps.filter("poly_idx = 0")
    pix = tiles_to_pixels(_image_df(spark), GRID)
    out = aggregate(pix, wm).toPandas()
    assert np.isnan(_agg_values(out, 1)).all()
    assert np.isfinite(_agg_values(out, 0)).all()


def test_aggregate_from_png_tiles(spark):
    # lossy-format path: PSNR >= 40 dB gate means aggregates match to ~1e-3
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0)])
    wm = pixel_overlaps(spark, GRID, polys)
    pix = tiles_to_pixels(_image_df(spark, fmt="png"), GRID)
    out = aggregate(pix, wm).toPandas()
    assert np.allclose(_agg_values(out), [5.4999, 6.4999, 7.4999], atol=1e-3)


def test_agg_pandas_shape(spark):
    # xagg-shaped reconstitution (lists per polygon) for parity checks
    polys = PolygonSet([rect_ring(-0.5, -0.5, 1.5, 1.5)],
                       pd.DataFrame({"name": ["test"]}))
    wm = pixel_overlaps(spark, GRID, polys)
    agg = wm.agg_pandas()
    assert list(agg.pix_idxs.iloc[0]) == [0, 1, 2, 3]
    assert np.allclose(agg.rel_area.iloc[0][0],
                       [0.250019, 0.250019, 0.249981, 0.249981], atol=1e-6)
    assert agg.name.iloc[0] == "test"
