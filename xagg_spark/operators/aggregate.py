"""aggregate: NaN-renormalizing weighted mean over the overlap table.

Reproduces the reference's default ``impl='for_loop'`` semantics
(/root/reference/xagg/core.py:776-827, normalize at auxfuncs.py:10-53):

  w_p(pix)  = rel_area(pix) * add_weight(pix)
  valid(pix) = NOT all-NaN(value[pix, over all non-loc dims])   # one mask
                                                                # shared by
                                                                # all dims
  w_hat     = w_p / sum_{valid} w_p          (NaN if denominator == 0)
  agg[dim]  = sum_{terms where v and w_hat finite} v * w_hat    # skipna sum
  agg       = 0.0 when a polygon has valid pixels but every term at this dim
              is NaN (xarray .sum(skipna=True) of all-NaN -> 0.0)
  agg       = NaN when the polygon has no overlap or no valid pixels

One hash aggregate per (poly_idx, dims): Spark's partial+final aggregation is
the distributed version of all three reference impls at once (SURVEY §2.4).

All-variable aggregation happens in a single pass (reference loops vars but
reuses the weightmap, core.py:718-721).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

def _nan():
    return F.lit(float("nan"))


def _finite(c):
    return ~F.isnan(c) & c.isNotNull()


def aggregate(pix_values: DataFrame, wm, dims=("var", "t"),
              value_col: str = "value",
              broadcast_overlaps: bool | None = None) -> DataFrame:
    """pix_values: long DataFrame (pix_idx, *dims, value).  wm: WeightMap.

    Returns tidy long result: (poly_idx, *attrs, *dims, value) with the
    reference's for_loop NaN semantics.  `var` in dims plays the reference's
    per-variable loop; `t`/`plev`/... are the non-loc dims carried through
    (reference A3: one hash aggregate per (poly_idx, dims)).
    """
    dims = list(dims)
    over = wm.overlaps
    if not wm.has_weights:
        over = over.withColumn("weight", F.lit(1.0))

    # per-pixel-per-var all-NaN mask over ALL non-loc dims
    # (for_loop: `.all(other_dims)`, core.py:812).  `var` is special: the
    # mask is per (pix, var); the remaining dims are collapsed.
    mask_keys = ["pix_idx"] + (["var"] if "var" in dims else [])
    masks = (pix_values
             .groupBy(*mask_keys)
             .agg(F.max(F.when(_finite(F.col(value_col)), 1).otherwise(0)).alias("_any_finite"))
             .withColumn("all_nan", F.col("_any_finite") == 0)
             .drop("_any_finite"))

    # join masks onto the (small) overlap table, then normalize weights per
    # polygon over valid pixels: w_hat = w / sum_{valid} w, NaN when the
    # valid-sum is 0 (normalize() all-zero guard, auxfuncs.py:46-49)
    # persist: ov feeds both the denominator pass and the value join, and
    # recomputing it would re-run the upstream decode/refine lineage
    ov = over.join(masks, "pix_idx").persist()
    grp = ["poly_idx"] + (["var"] if "var" in dims else [])
    w_raw = F.col("rel_area") * F.col("weight")
    valid_w = F.when(~F.col("all_nan") & _finite(w_raw), w_raw)
    # per-(poly[,var]) denominators via groupBy (map-side partials), then
    # broadcast back — a window partitioned by poly_idx would concentrate a
    # domain-scale polygon's rows in one task
    stats = (ov.groupBy(*grp)
               .agg(F.sum(valid_w).alias("_denom"),
                    F.count(valid_w).alias("_n_valid")))
    ov = (ov.join(F.broadcast(stats), grp)
          .withColumn("_w", w_raw)
          .withColumn(
              "w_hat",
              F.when(F.col("all_nan") | (F.col("_denom") == 0.0), _nan())
               .otherwise(F.col("_w") / F.col("_denom"))))

    if broadcast_overlaps:
        ov = F.broadcast(ov)

    joined = pix_values.join(
        ov.select("poly_idx", "pix_idx", *(["var"] if "var" in dims else []),
                  "w_hat", "_n_valid"),
        on=["pix_idx"] + (["var"] if "var" in dims else []))

    v = F.col(value_col)
    term = F.when(_finite(v) & _finite(F.col("w_hat")), v * F.col("w_hat"))
    res = (joined
           .groupBy("poly_idx", *dims)
           .agg(F.sum(term).alias("_s"),
                F.max("_n_valid").alias("_nv"))
           .withColumn(
               value_col,
               F.when(F.col("_nv") == 0, _nan())
                .otherwise(F.coalesce(F.col("_s"), F.lit(0.0))))
           .drop("_s", "_nv"))

    # outer merge onto polygon attrs (reference J3, core.py:533-538): keep
    # zero-overlap polygons with NaN values for every dim combination.
    # dim_space comes from the (tiny) result, not from another full scan of
    # the fact table.
    spark = pix_values.sparkSession
    attrs = spark.createDataFrame(wm.polys.attrs)
    res = res.persist()
    dim_space = res.select(*dims).distinct()
    full = F.broadcast(attrs).crossJoin(F.broadcast(dim_space))
    out = (full.join(res, on=["poly_idx"] + dims, how="left")
               .withColumn(value_col,
                           F.when(F.col(value_col).isNull(), _nan())
                            .otherwise(F.col(value_col))))
    return out


def aggregate_pandas(pix_values: DataFrame, wm, dims=("var", "t"),
                     value_col: str = "value") -> pd.DataFrame:
    """Collect the tidy result sorted for parity fixtures."""
    out = aggregate(pix_values, wm, dims, value_col)
    return out.orderBy("poly_idx", *dims).toPandas()
