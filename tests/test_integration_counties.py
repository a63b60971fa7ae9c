"""Real-polygon integration: the reference repo's US-counties shapefile
(concave, multipart, thousands of polygons) through the full engine."""

import os

import numpy as np
import pytest

from xagg_spark.grid import GridSpec
from xagg_spark.io.vector import read_shp
from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
from xagg_spark.synth import generate_spark

REF_SHP = "/root/reference/data/geo_data/UScounties.shp"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_SHP),
                                reason="reference data not present")


def test_counties_overlap_and_aggregate(spark):
    polys_all = read_shp(REF_SHP)
    # Colorado-ish window: enough counties to be interesting, fast enough
    # for CI (includes concave shapes)
    keep = [i for i in range(len(polys_all))
            if all((-110 < r[:, 0]).all() and (r[:, 0] < -100).all()
                   and (36 < r[:, 1]).all() and (r[:, 1] < 42).all()
                   for r in polys_all.rings[i])]
    assert len(keep) > 50
    from xagg_spark.polygons import PolygonSet
    polys = PolygonSet([polys_all.rings[i] for i in keep],
                       polys_all.attrs.iloc[keep].drop(columns=["poly_idx"])
                       .reset_index(drop=True))

    grid = GridSpec(lat_edge=36.0, lon_edge=-110.0, dlat=0.125, dlon=0.125,
                    nlat=48, nlon=80, tile_h=48, tile_w=40)
    wm = pixel_overlaps(spark, grid, polys)
    sums = wm.overlaps.groupBy("poly_idx").sum("rel_area").toPandas()
    assert np.allclose(sums["sum(rel_area)"], 1.0, atol=1e-9)
    # most Colorado-window counties should overlap something
    assert len(sums) > len(keep) * 0.8

    imgs = generate_spark(spark, grid, ntime=2, fmt="png")
    out = aggregate(tiles_to_pixels(imgs, grid), wm).toPandas()
    got = out[~np.isnan(out["value"])]
    assert (got["value"] > 0).all() and (got["value"] < 98).all()
    assert "NAME" in out.columns  # county attrs carried through
