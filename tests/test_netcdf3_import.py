"""NetCDF3 classic codec (io.netcdf3) + reference-format weightmap import.

The writer is validated against HAND-BUILT bytes following the public
classic-format spec (not a self-round-trip): a file assembled field by
field with struct.pack must be byte-identical to write_netcdf3's output,
and read_netcdf3 must parse the hand-built bytes.
"""

import os
import struct

import numpy as np
import pandas as pd
import pytest

from xagg_spark.io.netcdf3 import read_netcdf3, write_netcdf3


def _spec_literal_bytes():
    """netcdf tiny { dimensions: x = 2; variables: double v(x);
    v:units = "m"; // global: :title = "t"  data: v = 1.5, 2.5 ; }"""
    b = b"CDF\x01"
    b += struct.pack(">i", 0)                                  # numrecs
    b += struct.pack(">ii", 0x0A, 1)                           # dim_list
    b += struct.pack(">i", 1) + b"x\x00\x00\x00"               # name "x"
    b += struct.pack(">i", 2)                                  # size 2
    b += struct.pack(">ii", 0x0C, 1)                           # gatt_list
    b += struct.pack(">i", 5) + b"title\x00\x00\x00"           # name "title"
    b += struct.pack(">ii", 2, 1) + b"t\x00\x00\x00"           # NC_CHAR "t"
    b += struct.pack(">ii", 0x0B, 1)                           # var_list
    b += struct.pack(">i", 1) + b"v\x00\x00\x00"               # name "v"
    b += struct.pack(">i", 1)                                  # ndims
    b += struct.pack(">i", 0)                                  # dimid 0
    b += struct.pack(">ii", 0x0C, 1)                           # vatt_list
    b += struct.pack(">i", 5) + b"units\x00\x00\x00"
    b += struct.pack(">ii", 2, 1) + b"m\x00\x00\x00"
    b += struct.pack(">ii", 6, 16)                             # NC_DOUBLE, 16B
    begin = len(b) + 4
    b += struct.pack(">i", begin)
    b += struct.pack(">2d", 1.5, 2.5)
    return b


def test_writer_matches_spec_literal(tmp_path):
    p = str(tmp_path / "t.nc")
    write_netcdf3(p, {"x": 2},
                  {"v": (["x"], np.array([1.5, 2.5]), {"units": "m"})},
                  global_attrs={"title": "t"})
    with open(p, "rb") as f:
        got = f.read()
    assert got == _spec_literal_bytes()


def test_reader_parses_spec_literal(tmp_path):
    p = str(tmp_path / "t.nc")
    with open(p, "wb") as f:
        f.write(_spec_literal_bytes())
    dims, variables, gatts = read_netcdf3(p)
    assert dims == {"x": 2}
    names, arr, attrs = variables["v"]
    assert names == ["x"]
    np.testing.assert_array_equal(arr, [1.5, 2.5])
    assert attrs["units"] == "m" and gatts["title"] == "t"


def test_roundtrip_types_and_strings(tmp_path):
    p = str(tmp_path / "r.nc")
    chars = np.zeros((3, 4), dtype="S1")
    for i, s in enumerate([b"ab", b"c", b"dddd"]):
        chars[i, :len(s)] = np.frombuffer(s, dtype="S1")
    write_netcdf3(p, {"n": 3, "slen": 4, "m": 2}, {
        "big": (["n"], np.array([1, 2, 2**40], dtype=np.int64)),   # ->f8
        "ids": (["n"], np.array([5, 6, 7], dtype=np.int64)),       # ->i4
        "f": (["n", "m"], np.arange(6, dtype=np.float32).reshape(3, 2)),
        "names": (["n", "slen"], chars),
    })
    dims, variables, _ = read_netcdf3(p)
    assert dims == {"n": 3, "slen": 4, "m": 2}
    assert variables["big"][1].dtype == np.dtype(">f8")
    np.testing.assert_array_equal(variables["big"][1], [1, 2, 2**40])
    assert variables["ids"][1].dtype == np.dtype(">i4")
    np.testing.assert_array_equal(variables["f"][1],
                                  np.arange(6).reshape(3, 2))
    got = [bytes(b"".join(row)).rstrip(b"\x00")
           for row in variables["names"][1].reshape(3, 4)]
    assert got == [b"ab", b"c", b"dddd"]


def test_reader_rejects_hdf5(tmp_path):
    p = str(tmp_path / "h.nc")
    with open(p, "wb") as f:
        f.write(b"\x89HDF\r\n\x1a\nmore")
    with pytest.raises(ValueError, match="classic"):
        read_netcdf3(p)


def test_agg_to_netcdf(spark, tmp_path):
    from xagg_spark import AggResult
    from xagg_spark.grid import GridSpec
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    from xagg_spark.polygons import PolygonSet, rect_ring
    from xagg_spark.synth import generate_spark

    grid = GridSpec(lat_edge=-2.0, lon_edge=-2.0, dlat=0.5, dlon=0.5,
                    nlat=8, nlon=8, tile_h=8, tile_w=8)
    polys = PolygonSet([rect_ring(-1.3, -1.2, 0.7, 0.9),
                        rect_ring(0.1, 0.1, 1.9, 1.8)],
                       pd.DataFrame({"name": ["a", "b"]}))
    wm = pixel_overlaps(spark, grid, polys)
    imgs = generate_spark(spark, grid, variables=("test",), ntime=2, fmt="raw32")
    out = aggregate(tiles_to_pixels(imgs, grid), wm, dims=("var", "t"))
    res = AggResult(out, polys, dims=("var", "t"))
    p = str(tmp_path / "agg.nc")
    res.to_netcdf(p)
    dims, variables, gatts = read_netcdf3(p)
    ds = res.to_dataset_dict()
    np.testing.assert_allclose(variables["test"][1], ds["test"], atol=1e-12)
    assert variables["test"][0] == ["poly_idx", "t"]
    np.testing.assert_array_equal(variables["poly_idx"][1],
                                  ds["coords"]["poly_idx"])
    assert "name" in variables           # polygon attr field rides along


def test_read_wm_xagg_roundtrip(spark, tmp_path):
    """Reference-layout directory (shp + classic _lat/_lon.nc + weights
    CSV, no readable .h5) -> read_wm_xagg -> aggregate matches the direct
    pixel_overlaps(weights) pipeline."""
    from xagg_spark.grid import GridSpec
    from xagg_spark.io import read_wm_xagg
    from xagg_spark.io.vector import write_shp
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    from xagg_spark.polygons import PolygonSet, rect_ring
    from xagg_spark.synth import generate_spark

    grid = GridSpec(lat_edge=-2.0, lon_edge=-2.0, dlat=0.5, dlon=0.5,
                    nlat=8, nlon=8, tile_h=8, tile_w=8)
    polys = PolygonSet([rect_ring(-1.3, -1.2, 0.7, 0.9)],
                       pd.DataFrame({"name": ["a"]}))

    d = tmp_path / "wmx"
    os.makedirs(d)
    write_shp(polys, str(d / "wmx.shp"))
    lat_c = np.repeat(grid.lat_axis(), grid.nlon)       # stacked loc order
    lon_c = np.tile(grid.lon_axis(), grid.nlat)
    from xagg_spark.io.netcdf3 import write_netcdf3 as w3
    n = grid.nlat * grid.nlon
    w3(str(d / "wmx_lat.nc"), {"loc": n}, {"latv": (["loc"], lat_c)})
    w3(str(d / "wmx_lon.nc"), {"loc": n}, {"lonv": (["loc"], lon_c)})
    wvals = (np.arange(n) % 3 + 1.0)
    pd.DataFrame({"weights": wvals}).to_csv(str(d / "wmx_weights.csv"))

    wm_imp = read_wm_xagg(spark, str(d))
    assert wm_imp.has_weights

    weights_pdf = pd.DataFrame({"pix_idx": np.arange(n, dtype=np.int64),
                                "weight": wvals})
    wm_dir = pixel_overlaps(spark, grid, polys, weights_pdf=weights_pdf)
    imgs = generate_spark(spark, grid, variables=("test",), ntime=2, fmt="raw32")
    pix = tiles_to_pixels(imgs, grid)
    a = aggregate(pix, wm_imp).orderBy("poly_idx", "t").toPandas()
    b = aggregate(pix, wm_dir).orderBy("poly_idx", "t").toPandas()
    np.testing.assert_allclose(a["value"], b["value"], rtol=0, atol=1e-9)


def test_read_wm_xagg_native_descending_order(spark, tmp_path):
    """A foreign export whose stacked loc vectors are in native
    DESCENDING-lat order: the weights CSV rows follow that loc order, so
    the importer must remap loc->pix_idx instead of assuming arange
    (otherwise weights silently attach to mirrored rows)."""
    from xagg_spark.grid import GridSpec
    from xagg_spark.io import read_wm_xagg
    from xagg_spark.io.netcdf3 import write_netcdf3 as w3
    from xagg_spark.io.vector import write_shp
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    from xagg_spark.polygons import PolygonSet, rect_ring
    from xagg_spark.synth import generate_spark

    grid = GridSpec(lat_edge=-2.0, lon_edge=-2.0, dlat=0.5, dlon=0.5,
                    nlat=8, nlon=8, tile_h=8, tile_w=8)
    polys = PolygonSet([rect_ring(-1.3, -1.2, 0.7, 0.9)],
                       pd.DataFrame({"name": ["a"]}))
    d = tmp_path / "wmd"
    os.makedirs(d)
    write_shp(polys, str(d / "wmd.shp"))
    lat_desc = grid.lat_axis()[::-1].copy()             # native: north-first
    lat_c = np.repeat(lat_desc, grid.nlon)
    lon_c = np.tile(grid.lon_axis(), grid.nlat)
    n = grid.nlat * grid.nlon
    w3(str(d / "wmd_lat.nc"), {"loc": n}, {"latv": (["loc"], lat_c)})
    w3(str(d / "wmd_lon.nc"), {"loc": n}, {"lonv": (["loc"], lon_c)})
    # weight depends on LATITUDE, so a mirrored attachment changes results
    wvals_locorder = np.repeat(np.arange(grid.nlat, 0, -1.0), grid.nlon)
    pd.DataFrame({"weights": wvals_locorder}).to_csv(str(d / "wmd_weights.csv"))

    wm_imp = read_wm_xagg(spark, str(d))

    # ground truth: same weights expressed on the ascending grid's pix_idx
    iy = np.arange(n) // grid.nlon
    wvals_sorted = (iy + 1.0)                   # row iy (south-first) -> iy+1
    weights_pdf = pd.DataFrame({"pix_idx": np.arange(n, dtype=np.int64),
                                "weight": wvals_sorted})
    wm_dir = pixel_overlaps(spark, grid, polys, weights_pdf=weights_pdf)
    imgs = generate_spark(spark, grid, variables=("test",), ntime=1, fmt="raw32")
    pix = tiles_to_pixels(imgs, grid)
    a = aggregate(pix, wm_imp).orderBy("poly_idx", "t").toPandas()
    b = aggregate(pix, wm_dir).orderBy("poly_idx", "t").toPandas()
    np.testing.assert_allclose(a["value"], b["value"], rtol=0, atol=1e-9)
