"""4-D (time x plev) and multi-variable aggregation goldens
(/root/reference/tests/test_core.py:664-790)."""

import numpy as np
import pandas as pd

from xagg_spark.grid import GridSpec
from xagg_spark.operators import aggregate, pixel_overlaps
from xagg_spark.polygons import PolygonSet, rect_ring

# lat [0,1], lon [0,1,2]; bounds half-spacing 1 deg
GRID = GridSpec(lat_edge=-0.5, lon_edge=-0.5, dlat=1.0, dlon=1.0,
                nlat=2, nlon=3, tile_h=2, tile_w=3)

GOLD = 0.99933294  # equal-area latitude effect on the 2x2-pixel polygons


def _pix_values_4d(spark, variables=("test",)):
    rows = []
    for vi, var in enumerate(variables):
        base = vi * 72
        for iy in range(2):
            for ix in range(3):
                for it in range(4):
                    for ip in range(3):
                        v = ((iy * 3 + ix) * 4 + it) * 3 + ip + 1 + base
                        rows.append({"pix_idx": iy * 3 + ix, "var": var,
                                     "t": it, "plev": [1000, 950, 900][ip],
                                     "value": float(v)})
    return spark.createDataFrame(pd.DataFrame(rows))


def _polys():
    return PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0),
                       rect_ring(1.0, 0.0, 2.0, 1.0)],
                      pd.DataFrame({"name": ["test1", "test2"]}))


def test_aggregate_4d_golden(spark):
    # expected: poly0 -> arange(24,36)+0.99933294 reshaped (time=4, plev=3);
    # poly1 -> arange(36,48)+0.99933294 (test_core.py:699-705)
    wm = pixel_overlaps(spark, GRID, _polys())
    pix = _pix_values_4d(spark)
    out = aggregate(pix, wm, dims=("var", "t", "plev")).toPandas()
    for poly, lo in ((0, 24), (1, 36)):
        sub = out[out.poly_idx == poly].sort_values(["t", "plev"],
                                                    ascending=[True, False])
        want = np.arange(lo, lo + 12) + GOLD
        assert np.allclose(sub["value"].to_numpy(), want, atol=1e-4), \
            (poly, sub["value"].to_numpy(), want)


def test_aggregate_4d_multivar(spark):
    # two 4-D variables in one pass (test_core.py:744-790 analog):
    # second variable offset by +72 shifts the aggregate by exactly 72
    wm = pixel_overlaps(spark, GRID, _polys())
    pix = _pix_values_4d(spark, variables=("testvar", "testvar2"))
    out = aggregate(pix, wm, dims=("var", "t", "plev")).toPandas()
    for var, off in (("testvar", 0.0), ("testvar2", 72.0)):
        for poly, lo in ((0, 24), (1, 36)):
            sub = out[(out.poly_idx == poly) & (out["var"] == var)] \
                .sort_values(["t", "plev"], ascending=[True, False])
            want = np.arange(lo, lo + 12) + GOLD + off
            assert np.allclose(sub["value"].to_numpy(), want, atol=1e-4)


def test_aggregate_row_order_independent(spark):
    # dim-permutation analog (test_core.py:707-740): long-form input makes
    # dim order irrelevant by construction; shuffle rows to prove it
    wm = pixel_overlaps(spark, GRID, _polys())
    pix = _pix_values_4d(spark).orderBy("plev", "t", "pix_idx")  # scrambled
    out = aggregate(pix, wm, dims=("var", "t", "plev")).toPandas()
    sub = out[out.poly_idx == 0].sort_values(["t", "plev"],
                                             ascending=[True, False])
    assert np.allclose(sub["value"].to_numpy(),
                       np.arange(24, 36) + GOLD, atol=1e-4)
