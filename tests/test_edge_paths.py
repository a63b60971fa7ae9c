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
