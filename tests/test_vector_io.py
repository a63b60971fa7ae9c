"""Shapefile/GeoJSON reader-writer round-trips (reference S2/S7) — including
against the reference repo's own shapefile test data (read-only)."""

import os

import numpy as np
import pandas as pd
import pytest

from xagg_spark.io.vector import read_geojson, read_shp, write_shp
from xagg_spark.polygons import PolygonSet, rect_ring

REF_SHP = "/root/reference/data/geo_data/UScounties.shp"


def test_shp_roundtrip(tmp_path):
    polys = PolygonSet([rect_ring(-1.5, -1.0, 2.0, 1.0),
                        [rect_ring(5.0, 5.0, 6.0, 6.0),
                         rect_ring(7.0, 5.0, 8.0, 6.0)]],  # multipolygon
                       pd.DataFrame({"name": ["a", "b"]}))
    fn = str(tmp_path / "t.shp")
    write_shp(polys, fn)
    back = read_shp(fn)
    assert len(back) == 2
    assert list(back.attrs["name"]) == ["a", "b"]
    # same vertex sets (orientation may flip)
    got = np.array(sorted(map(tuple, back.rings[0][0])))
    want = np.array(sorted(map(tuple, polys.rings[0][0])))
    assert np.allclose(got, want)
    assert len(back.rings[1]) == 2


@pytest.mark.skipif(not os.path.exists(REF_SHP),
                    reason="reference data not present")
def test_read_reference_uscounties():
    # the reference's own test shapefile (tests/test_diag.py:24)
    polys = read_shp(REF_SHP)
    assert len(polys) > 3000  # ~3233 US counties
    assert "NAME" in polys.attrs.columns
    lon0, lat0, lon1, lat1 = polys.total_bounds()
    assert -180 <= lon0 < lon1 <= 180 and -90 <= lat0 < lat1 <= 90
    assert polys.pick_epsg() == 6931  # all-northern -> EASE North


def test_geojson_roundtrip(tmp_path):
    polys = PolygonSet([rect_ring(0, 0, 1, 1)], pd.DataFrame({"name": ["x"]}))
    gj = {"type": "FeatureCollection", "features": [{
        "type": "Feature",
        "geometry": {"type": "Polygon",
                     "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
        "properties": {"name": "x"}}]}
    back = read_geojson(gj)
    assert len(back) == 1 and back.attrs["name"][0] == "x"
    assert np.allclose(np.sort(back.rings[0][0], axis=0),
                       np.sort(polys.rings[0][0], axis=0))
