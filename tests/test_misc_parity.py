"""Small parity pieces: rename cipher, options API, salt path, centroid."""

import numpy as np
import pandas as pd
import pytest

from xagg_spark.grid import GridSpec
from xagg_spark.operators import pixel_overlaps
from xagg_spark.operators.rename import rename_latlon
from xagg_spark.options import get_options, option_context, set_options
from xagg_spark.polygons import PolygonSet, rect_ring

GRID = GridSpec(lat_edge=-2.0, lon_edge=-2.0, dlat=1.0, dlon=1.0,
                nlat=4, nlon=4, tile_h=4, tile_w=4)


def test_rename_cipher(spark):
    # /root/reference/tests/test_auxfuncs.py:48-66 analog
    df = spark.createDataFrame(pd.DataFrame(
        {"Latitude": [0.0], "Longitude": [1.0], "v": [2.0]}))
    out = rename_latlon(df)
    assert {"lat", "lon", "v"} <= set(out.columns)
    df2 = spark.createDataFrame(pd.DataFrame(
        {"y": [0.0], "x": [1.0]}))
    assert {"lat", "lon"} <= set(rename_latlon(df2).columns)
    with pytest.raises(NameError):
        rename_latlon(spark.createDataFrame(pd.DataFrame({"a": [1]})))


def test_rename_bnds_heuristic(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"latitude": [0.0], "longitude": [1.0],
         "lo_bnds": [0.0], "la_bnds": [0.0]}))
    with pytest.warns(UserWarning, match="longitude bounds"):
        out = rename_latlon(df)
    assert {"lon_bnds", "lat_bnds"} <= set(out.columns)


def test_options_api():
    # reference options.py:46-118 semantics
    base = get_options()
    assert base["impl"] == "spark_sql"
    with pytest.raises(ValueError):
        set_options(impl="bogus")
    with pytest.raises(ValueError):
        set_options(not_an_option=1)
    with option_context(silent=True, salt=3):
        assert get_options()["silent"] is True
        assert get_options()["salt"] == 3
    assert get_options() == base


def test_salt_path_identical_results(spark):
    polys = PolygonSet([rect_ring(-1.3, -1.2, 1.4, 1.1)])
    a = pixel_overlaps(spark, GRID, polys).overlaps \
        .orderBy("pix_idx").toPandas()
    b = pixel_overlaps(spark, GRID, polys, salt=2).overlaps \
        .orderBy("pix_idx").toPandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_centroids():
    # G6: polygon centroid (driver-side; used by kNN queries)
    from xagg_spark.polygons import centroids
    polys = PolygonSet([rect_ring(0.0, 0.0, 2.0, 4.0),
                        np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 3.0]])])
    c = centroids(polys)
    assert np.allclose(c[0], [1.0, 2.0])
    assert np.allclose(c[1], [1.0, 1.0])
