"""Table sources/sinks: Iceberg when available, parquet fallback.

The production input (BASELINE.json input_hint) is an Iceberg table of
image rows.  This container has no Iceberg runtime jar, so the helpers
detect the catalog at call time and fall back to parquet paths with the
same layout conventions:

- image tables partitioned by bucket(tile position) so the bbox prefilter
  (P2) prunes files;
- overlap checkpoints partitioned by bucket (weightmap_io).

On a real cluster, pass ``--packages org.apache.iceberg:iceberg-spark-
runtime-...`` + catalog conf to spark-submit and these helpers use
``spark.read.format("iceberg")`` / ``df.writeTo(table)`` unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable")
        return True
    except Exception:
        return False


def read_images(spark: SparkSession, source: str) -> DataFrame:
    """source: 'catalog.db.table' (Iceberg) or a parquet path."""
    if "/" not in source and iceberg_available(spark):
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def write_images(df: DataFrame, target: str, mode: str = "append",
                 tile_buckets: int = 64) -> None:
    """Partition by a deterministic tile bucket (derived from image_id, so
    pruning works for spatial prefilters at any parallelism)."""
    df = df.withColumn(
        "tile_bucket",
        F.pmod(F.xxhash64(F.col("image_id")), F.lit(tile_buckets)))
    if "/" not in target and iceberg_available(df.sparkSession):
        (df.writeTo(target).partitionedBy("tile_bucket")
           .createOrReplace() if mode == "overwrite"
         else df.writeTo(target).append())
        return
    df.write.mode(mode).partitionBy("tile_bucket").parquet(target)


def save_copartitioned(pix_values: DataFrame, wm, name: str,
                       n_buckets: int = 64, mode: str = "overwrite") -> None:
    """Write the decoded fact table AND the overlap table as BUCKETED
    tables on pix_idx (same bucket count), so the aggregate's
    fact ⨝ overlaps join needs NO exchange on either side — the 100 TB
    answer to the one remaining shuffle in the pipeline (at cluster scale:
    the Iceberg ``bucket(pix_idx)`` partition transform plays this role).

    Tables land in the session catalog as ``<name>_fact`` /
    ``<name>_overlaps``; reload with read_copartitioned.
    """
    (pix_values.write.mode(mode)
        .bucketBy(n_buckets, "pix_idx").sortBy("pix_idx")
        .saveAsTable(f"{name}_fact"))
    (wm.overlaps.write.mode(mode)
        .bucketBy(n_buckets, "pix_idx").sortBy("pix_idx")
        .saveAsTable(f"{name}_overlaps"))


def read_copartitioned(spark: SparkSession, name: str, polys, grid, epsg):
    """Reload a save_copartitioned pair: (fact DataFrame, WeightMap whose
    overlap side carries the bucket distribution — joins on pix_idx against
    the fact table are exchange-free).

    n_rows is left None ON PURPOSE: counting would scan the table at load
    time, and with None the aggregate auto-picks the non-broadcast join —
    exactly the bucket-co-located SortMergeJoin these tables exist for."""
    from ..operators.overlaps import WeightMap
    fact = spark.table(f"{name}_fact")
    overlaps = spark.table(f"{name}_overlaps")
    wm = WeightMap(overlaps=overlaps, polys=polys, grid=grid, epsg=epsg,
                   has_weights="weight" in overlaps.columns,
                   n_rows=None, bucketed=True)
    return fact, wm


def prefilter_images_bbox(images: DataFrame, grid, lon_min: float,
                          lat_min: float, lon_max: float,
                          lat_max: float) -> DataFrame:
    """P2 pushdown at the TILE level: parse (ty, tx) from image_id
    (synth.image_id layout) with JVM string ops and keep only tiles whose
    bbox intersects the padded query bbox — a plain predicate Catalyst can
    push to the scan, so pruned tiles are never decoded."""
    ty = F.element_at(F.split(F.col("image_id"), "_"), -2).cast("long")
    tx = F.element_at(F.split(F.col("image_id"), "_"), -1).cast("long")
    tlat0 = F.lit(grid.lat_edge) + ty * F.lit(grid.tile_h * grid.dlat)
    tlon0 = F.lit(grid.lon_edge) + tx * F.lit(grid.tile_w * grid.dlon)
    tlat1 = tlat0 + F.lit(grid.tile_h * grid.dlat)
    tlon1 = tlon0 + F.lit(grid.tile_w * grid.dlon)
    return images.filter((tlat1 > lat_min) & (tlat0 < lat_max)
                         & (tlon1 > lon_min) & (tlon0 < lon_max))
