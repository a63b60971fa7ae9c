"""impl='dot_product' parity (reference /root/reference/xagg/core.py:716-775
and tri-impl tests tests/test_core.py:587-619, :871-905).

- On all-finite data, for_loop and dot_product agree exactly.
- Under partial NaN (a pixel NaN at SOME timesteps), dot_product drops that
  pixel's weight at those timesteps (per-coordinate renormalization) while
  for_loop keeps it — expected values computed independently in numpy.
"""

import numpy as np
import pandas as pd
import pytest

from xagg_spark.codecs import encode_tile
from xagg_spark.grid import GridSpec
from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
from xagg_spark.polygons import PolygonSet, rect_ring

GRID = GridSpec(lat_edge=-1.0, lon_edge=-1.0, dlat=1.0, dlon=1.0,
                nlat=2, nlon=2, tile_h=2, tile_w=2)


def _imgs(spark, vals):
    """vals: (t, 2, 2) float array -> one raw32 tile per t."""
    rows = []
    for t in range(vals.shape[0]):
        arr = vals[t].astype(np.float32)
        rows.append({"image_id": f"tile_test_{t:04d}_00000_00000",
                     "bytes": encode_tile(arr, "raw32"), "w": 2, "h": 2,
                     "fmt": "raw32", "caption": "c", "phash": 0})
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.fixture(scope="module")
def wm(spark):
    # polygon = lower-left quarter of each of the 4 pixels? No: cover all 4
    # pixels partially, like the reference's (0,0)-(1,1) box over a 2x2
    # 1-degree grid centered at 0/1
    polys = PolygonSet([rect_ring(-0.5, -0.5, 1.49, 1.49)],
                       pd.DataFrame({"name": ["x"]}))
    return pixel_overlaps(spark, GRID, polys)


def _rel_areas(wm):
    pdf = wm.overlaps.toPandas().sort_values("pix_idx")
    return pdf.pix_idx.to_numpy(), pdf.rel_area.to_numpy()


def test_impls_agree_on_finite_data(spark, wm):
    vals = np.arange(1.0, 13.0).reshape(3, 2, 2)
    pix = tiles_to_pixels(_imgs(spark, vals), GRID)
    a = aggregate(pix, wm, impl="for_loop").orderBy("t").toPandas()
    b = aggregate(pix, wm, impl="dot_product").orderBy("t").toPandas()
    np.testing.assert_allclose(a["value"], b["value"], rtol=0, atol=1e-12)


def test_impls_diverge_on_partial_nan(spark, wm):
    vals = np.arange(1.0, 13.0).reshape(3, 2, 2)
    vals[0, 1, 1] = np.nan          # pixel (iy=1, ix=1) NaN at t=0 only
    pix = tiles_to_pixels(_imgs(spark, vals), GRID)
    a = aggregate(pix, wm, impl="for_loop").orderBy("t").toPandas()
    b = aggregate(pix, wm, impl="dot_product").orderBy("t").toPandas()

    pidx, w = _rel_areas(wm)
    flat = vals.reshape(3, 4)[:, pidx]
    # for_loop: pixel valid (finite at t=1,2) -> denominator keeps its
    # weight at every t; the NaN term drops from the numerator only
    exp_for = [np.nansum(flat[t] * w) / w.sum() for t in range(3)]
    # dot_product: weight masked per (pixel, t)
    exp_dot = [np.nansum(flat[t] * w) / w[~np.isnan(flat[t])].sum()
               for t in range(3)]
    np.testing.assert_allclose(a["value"], exp_for, rtol=0, atol=1e-12)
    np.testing.assert_allclose(b["value"], exp_dot, rtol=0, atol=1e-12)
    assert abs(exp_for[0] - exp_dot[0]) > 1e-3       # genuinely diverge
    np.testing.assert_allclose(exp_for[1:], exp_dot[1:], atol=1e-15)


def test_dot_product_all_nan_var_is_nan(spark, wm):
    vals = np.full((2, 2, 2), np.nan)
    pix = tiles_to_pixels(_imgs(spark, vals), GRID)
    b = aggregate(pix, wm, impl="dot_product").toPandas()
    assert np.isnan(b["value"]).all()


def test_aggregate_rejects_unknown_impl(spark, wm):
    vals = np.ones((1, 2, 2))
    pix = tiles_to_pixels(_imgs(spark, vals), GRID)
    with pytest.raises(ValueError, match="impl"):
        aggregate(pix, wm, impl="numba-ish")
