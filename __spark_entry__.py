"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query: per-polygon area-weighted aggregate of a
                    deterministic synthetic image-tile table (the engine's
                    native input per BASELINE.json input_hint), with polygon
                    attributes joined from the sf0.001 nation table.
queries()         — one entry per implemented operator (SURVEY.md §2).
oracle_sql()      — DuckDB twins; geospatial oracles recompute exact EASE
                    equal-area overlap fractions analytically in SQL.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: decode tiles -> overlap-join polygons -> weighted mean,
    polygon attrs from /root/testdata/sf0.001/nation.parquet."""
    import pandas as pd

    from xagg_spark.driver_queries import QGRID, _qpolys
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    from xagg_spark.synth import generate_spark

    nations = (spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
                    .orderBy("n_nationkey").limit(12).toPandas())
    polys = _qpolys()
    polys.attrs["n_name"] = list(nations["n_name"])[:len(polys.attrs)]

    wm = pixel_overlaps(spark, QGRID, polys)
    imgs = generate_spark(spark, QGRID, variables=("test",), ntime=3, fmt="png")
    # P2 at the TILE level: prune tiles outside the polygons' bbox BEFORE
    # decode (a pixel can only overlap a polygon if its tile intersects the
    # polygon bbox, so this is value-neutral).  Over a parquet/Iceberg
    # source the predicate sits directly on the scan; here it gates the
    # decode UDF.
    from xagg_spark.io.tables import prefilter_images_bbox
    lon0, lat0, lon1, lat1 = polys.total_bounds()
    imgs = prefilter_images_bbox(imgs, QGRID, lon0, lat0, lon1, lat1)
    pix = tiles_to_pixels(imgs, QGRID)
    out = aggregate(pix, wm, dims=("var", "t"))
    return out.select("poly_idx", "name", "n_name", "var",
                      F.col("t").cast("long").alias("t"),
                      F.round("value", 6).alias("value"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from xagg_spark.driver_queries import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    from xagg_spark.driver_queries import all_oracle_sql
    return all_oracle_sql()
