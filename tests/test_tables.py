"""Iceberg-or-parquet table helpers + tile-level bbox pushdown."""

import numpy as np

from xagg_spark.grid import GridSpec
from xagg_spark.io.tables import (iceberg_available, prefilter_images_bbox,
                                  read_images, write_images)
from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
from xagg_spark.polygons import PolygonSet, rect_ring
from xagg_spark.synth import generate_spark

GRID = GridSpec(lat_edge=0.0, lon_edge=0.0, dlat=0.5, dlon=0.5,
                nlat=32, nlon=32, tile_h=8, tile_w=8)


def test_roundtrip_with_bucketing(spark, tmp_path):
    p = str(tmp_path / "imgs")
    imgs = generate_spark(spark, GRID, ntime=1, fmt="raw32")
    write_images(imgs, p, mode="overwrite")
    back = read_images(spark, p)
    assert back.count() == GRID.ntiles
    assert "tile_bucket" in back.columns
    # iceberg not present in this env: helper must report it honestly
    assert iceberg_available(spark) is False


def test_tile_bbox_prefilter_prunes_and_preserves_results(spark):
    imgs = generate_spark(spark, GRID, ntime=1, fmt="raw32")
    polys = PolygonSet([rect_ring(1.2, 1.1, 4.3, 3.9)])
    lon0, lat0, lon1, lat1 = polys.total_bounds()
    pruned = prefilter_images_bbox(imgs, GRID, lon0 - 1, lat0 - 1,
                                   lon1 + 1, lat1 + 1)
    n_all, n_pruned = imgs.count(), pruned.count()
    assert n_pruned < n_all  # actually pruned whole tiles
    # identical aggregate from the pruned table
    wm = pixel_overlaps(spark, GRID, polys)
    a = aggregate(tiles_to_pixels(imgs, GRID), wm).toPandas()
    b = aggregate(tiles_to_pixels(pruned, GRID), wm).toPandas()
    a = a.sort_values(["poly_idx", "t"]).reset_index(drop=True)
    b = b.sort_values(["poly_idx", "t"]).reset_index(drop=True)
    assert np.allclose(a["value"], b["value"], equal_nan=True)
