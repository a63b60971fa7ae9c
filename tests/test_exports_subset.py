"""Export layer + subset_find + SomeNanWarning tests (reference
test_export.py / test_auxfuncs.py / test_core.py:871-905 parity)."""

import json

import numpy as np
import pandas as pd
import pytest

from xagg_spark.codecs import encode_tile
from xagg_spark.grid import GridSpec
from xagg_spark.io.sinks import AggResult
from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
from xagg_spark.operators.subset import (SomeNanWarning, subset_find,
                                         warn_if_partial_nan)
from xagg_spark.polygons import PolygonSet, rect_ring

GRID = GridSpec(lat_edge=-0.5, lon_edge=-0.5, dlat=1.0, dlon=1.0,
                nlat=2, nlon=2, tile_h=2, tile_w=2)


def _images(spark, nan_at=None):
    rows = []
    for t in range(3):
        vals = np.arange(1, 13).reshape(2, 2, 3)
        arr = vals[:, :, t].T.astype(np.float32)
        if nan_at and t in nan_at:
            arr[nan_at[t]] = np.nan
        rows.append({"image_id": f"tile_test_{t:04d}_00000_00000",
                     "bytes": encode_tile(arr, "raw32"), "w": 2, "h": 2,
                     "fmt": "raw32", "caption": "x", "phash": 0})
    return spark.createDataFrame(pd.DataFrame(rows))


def _result(spark):
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0),
                        rect_ring(-1.0, 0.0, 0.0, 1.0)],
                       pd.DataFrame({"name": ["p0", "p1"]}))
    wm = pixel_overlaps(spark, GRID, polys)
    pix = tiles_to_pixels(_images(spark), GRID)
    return AggResult(aggregate(pix, wm), polys)


def test_to_dataframe_long(spark):
    r = _result(spark)
    pdf = r.to_dataframe()
    assert len(pdf) == 2 * 3  # 2 polys x 3 t
    assert set(pdf.columns) >= {"poly_idx", "name", "var", "t", "value"}


def test_to_wide_golden(spark):
    # wide expansion test0, test1, test2 (reference export.py:144-231;
    # golden shape from test_export.py:168-171)
    r = _result(spark)
    wide = r.to_wide()
    assert {"test0", "test1", "test2"} <= set(wide.columns)
    row0 = wide[wide.poly_idx == 0].iloc[0]
    assert np.allclose([row0.test0, row0.test1, row0.test2],
                       [5.4999, 6.4999, 7.4999], atol=1e-4)


def test_wide_rejects_two_extra_dims(spark):
    # reference raises for >1 extra dim (export.py:182-189)
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0)])
    wm = pixel_overlaps(spark, GRID, polys)
    pix = tiles_to_pixels(_images(spark), GRID)
    pix4 = pix.crossJoin(spark.range(2).withColumnRenamed("id", "plev"))
    out = aggregate(pix4, wm, dims=("var", "t", "plev"))
    r = AggResult(out, polys, dims=("var", "t", "plev"))
    with pytest.raises(NotImplementedError):
        r.to_wide()


def test_csv_roundtrip(spark, tmp_path):
    r = _result(spark)
    fn = str(tmp_path / "out.csv")
    r.to_csv(fn, wide=True)
    back = pd.read_csv(fn)
    assert len(back) == 2 and "test0" in back.columns


def test_geojson(spark, tmp_path):
    r = _result(spark)
    fn = str(tmp_path / "out.geojson")
    gj = r.to_geojson(fn)
    assert gj["type"] == "FeatureCollection" and len(gj["features"]) == 2
    with open(fn) as f:
        assert json.load(f)["features"][0]["geometry"]["type"] == "Polygon"
    props = gj["features"][0]["properties"]
    assert "test0" in props and props["name"] in ("p0", "p1")


def test_dataset_dict(spark):
    r = _result(spark)
    ds = r.to_dataset_dict()
    assert ds["test"].shape == (2, 3)
    assert list(ds["coords"]["t"]) == [0, 1, 2]


def test_subset_find_ok_and_error(spark):
    polys = PolygonSet([rect_ring(0.0, 0.0, 1.0, 1.0)])
    wm = pixel_overlaps(spark, GRID, polys)
    pix = tiles_to_pixels(_images(spark), GRID)
    sub = subset_find(pix, wm.overlaps)
    assert sub.count() == 4 * 3
    with pytest.raises(ValueError, match="Was not able to match grids"):
        subset_find(pix.filter("pix_idx < 2"), wm.overlaps)


def test_partial_nan_warning(spark):
    # test_core.py:871-905: one pixel NaN at one timestep only -> warning
    pix = tiles_to_pixels(_images(spark, nan_at={1: (0, 0)}), GRID)
    with pytest.warns(SomeNanWarning):
        assert warn_if_partial_nan(pix)
    # all-NaN pixel (every t) -> no warning
    pix2 = tiles_to_pixels(
        _images(spark, nan_at={0: (0, 0), 1: (0, 0), 2: (0, 0)}), GRID)
    assert not warn_if_partial_nan(pix2)


def test_partial_nan_warning_names_var_and_dims(spark):
    """Per-dim parity with the reference's _warn_ifsomenans
    (auxfuncs.py:73-197): the warning names the variable and exactly the
    dims with inconsistent nans.  Pixel 0 is NaN at t=0 for EVERY plev:
    partial along t, but along plev the t=0 slice is all-NaN (dropped by
    the dropna step) -> only 't' is named."""
    import itertools

    rows = []
    for t, plev, pix in itertools.product(range(3), range(2), range(4)):
        val = np.nan if (pix == 0 and t == 0) else float(pix + t + plev)
        rows.append(("tas", t, plev, pix, val))
    pdf = pd.DataFrame(rows, columns=["var", "t", "plev", "pix_idx", "value"])
    df = spark.createDataFrame(pdf)
    with pytest.warns(SomeNanWarning) as rec:
        assert warn_if_partial_nan(df, dims=("t", "plev"))
    msgs = [str(w.message) for w in rec if isinstance(w.message, SomeNanWarning)]
    assert len(msgs) == 1
    assert "variable tas" in msgs[0]
    assert "dimension(s) t " in msgs[0] and "plev" not in msgs[0]


def test_partial_nan_default_var_col_is_sentinel(spark):
    """ADVICE r4: a frame WITHOUT a 'var' column gets the cross-variable
    diagnosis under the DEFAULT var_col (no raise); an EXPLICITLY passed
    missing var_col still raises."""
    pdf = pd.DataFrame({
        "t": [0, 1, 0, 1],
        "pix_idx": [0, 0, 1, 1],
        "value": [np.nan, 1.0, 2.0, 3.0],     # pixel 0 partial along t
    })
    df = spark.createDataFrame(pdf)
    with pytest.warns(SomeNanWarning):
        assert warn_if_partial_nan(df)        # default: auto -> None here
    with pytest.raises(ValueError, match="var_col 'tas' not in the input"):
        warn_if_partial_nan(df, var_col="tas")
