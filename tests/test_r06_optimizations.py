"""Round-6 optimization pins: the changed internals must keep their
contracts — single-file sorted buckets, aggregation-based kNN top-k
equivalence, and the adaptive dense-denominator guard of aggregate()."""

import shutil

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from xagg_spark.grid import GridSpec
from xagg_spark.polygons import PolygonSet, rect_ring


def test_save_copartitioned_single_file_per_bucket(spark):
    """The write must land exactly ONE file per bucket per table — the
    precondition for Spark trusting the sortBy metadata at scan time
    (multi-file buckets silently re-Sort the 'exchange-free' join)."""
    from xagg_spark.io.tables import save_copartitioned
    from xagg_spark.operators import pixel_overlaps, tiles_to_pixels
    from xagg_spark.synth import generate_spark

    for t in ("sfb_fact", "sfb_overlaps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    grid = GridSpec(lat_edge=-4.0, lon_edge=-4.0, dlat=0.5, dlon=0.5,
                    nlat=16, nlon=16, tile_h=8, tile_w=8)
    polys = PolygonSet([rect_ring(-2.3, -2.1, 2.2, 2.4)],
                       pd.DataFrame({"name": ["x"]}))
    wm = pixel_overlaps(spark, grid, polys)
    pix = tiles_to_pixels(
        generate_spark(spark, grid, ntime=2, fmt="raw32"), grid)
    # many input partitions so the old layout would have produced
    # n_partitions x n_buckets files
    save_copartitioned(pix.repartition(8), wm, "sfb", n_buckets=4)
    for t in ("sfb_fact", "sfb_overlaps"):
        files = spark.table(t).inputFiles()
        assert len(files) == 4, (t, files)
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    wm.unpersist()


def test_topk_struct_agg_matches_window_ranking(spark):
    """_topk_struct_agg must reproduce row_number() over (dist2 asc,
    pix_idx asc) exactly, including ties and under-k groups."""
    from xagg_spark.operators.knn import _topk_struct_agg

    rows = []
    rng = np.random.RandomState(7)
    for q in range(30):
        n = int(rng.randint(1, 12))
        for i in range(n):
            # forced ties: quantized distances
            rows.append((q, float(rng.randint(0, 4)), int(rng.randint(0, 50))))
    df = spark.createDataFrame(rows, "q_id long, dist2 double, pix_idx long")
    got = (_topk_struct_agg(df, 5)
           .select("q_id", F.posexplode("_t").alias("_p", "_s"))
           .select("q_id", (F.col("_p") + 1).alias("rank"),
                   F.col("_s.dist2").alias("dist2"),
                   F.col("_s.pix_idx").alias("pix_idx"))
           .toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True))
    from pyspark.sql import Window
    w = Window.partitionBy("q_id").orderBy(F.asc("dist2"), F.asc("pix_idx"))
    want = (df.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= 5)
              .toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["q_id", "rank", "dist2", "pix_idx"]].astype(
            {"rank": "int64"}),
        want[["q_id", "rank", "dist2", "pix_idx"]].astype(
            {"rank": "int64"}))


def test_aggregate_dense_fast_path_equals_general_path(spark):
    """The dense-data denominator shortcut must produce the same result as
    the general per-pixel path.  Forcing the general path on the SAME
    dense data (n_rows=None disables the guard) must match the fast
    path's output to float equality after rounding."""
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    from xagg_spark.synth import generate_spark

    grid = GridSpec(lat_edge=-6.0, lon_edge=-6.0, dlat=0.5, dlon=0.5,
                    nlat=20, nlon=24, tile_h=10, tile_w=12)
    polys = PolygonSet([rect_ring(-3.3, -3.1, 3.2, 3.4),
                        rect_ring(0.1, -5.0, 5.5, -0.7)],
                       pd.DataFrame({"name": ["a", "b"]}))
    wm = pixel_overlaps(spark, grid, polys)
    pix = tiles_to_pixels(
        generate_spark(spark, grid, ntime=2, fmt="raw32"), grid)
    fast = (aggregate(pix, wm, dims=("var", "t"))
            .orderBy("poly_idx", "t").toPandas())
    assert wm.n_rows is not None           # fast path really was eligible
    saved = wm.n_rows
    try:
        wm.n_rows = None                   # guard off -> general path
        slow = (aggregate(pix, wm, dims=("var", "t"))
                .orderBy("poly_idx", "t").toPandas())
    finally:
        wm.n_rows = saved
    np.testing.assert_allclose(fast["value"], slow["value"],
                               rtol=0, atol=1e-9)
    # and a NaN-poked fact must take the general path and stay
    # renormalization-correct: poke one pixel's t=0 value to NaN
    poked = pix.withColumn(
        "value", F.when((F.col("pix_idx") == 200) & (F.col("t") == 0),
                        float("nan")).otherwise(F.col("value")))
    out = (aggregate(poked, wm, dims=("var", "t"))
           .orderBy("poly_idx", "t").toPandas())
    assert np.isfinite(out["value"]).all()
    wm.unpersist()
