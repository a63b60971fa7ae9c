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

Physical plan (byte-traffic-minimal form):

  all-NaN pixels are detected in one narrow aggregate over the fact table
  and are typically ~0 rows, so the per-(poly[,var]) denominators are
  computed as  tot_w(poly) - nan_w(poly[,var])  from TINY broadcast tables —
  the overlap table is never shuffled against a per-pixel mask.  The only
  large shuffle is the unavoidable fact ⨝ overlaps equi-join on pix_idx,
  followed by one partial+final hash aggregate per (poly_idx, dims).

All-variable aggregation happens in a single pass (reference loops vars but
reuses the weightmap, core.py:718-721).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _nan():
    return F.lit(float("nan"))


def _finite(c):
    return ~F.isnan(c) & c.isNotNull()


# auto-broadcast threshold for the overlap side: small weightmaps skip the
# fact-table exchange entirely.  Local A/B at 3.8M rows showed parity (the
# broadcast build offsets the saved local shuffle), so the default favors
# broadcast only when it is unambiguously cheap; on a real cluster (network
# shuffle) callers should raise it or pass broadcast_overlaps=True.
BROADCAST_OVERLAPS_MAX_ROWS = 1_000_000


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
    has_var = "var" in dims
    vkeys = ["var"] if has_var else []
    over = wm.overlaps
    if not wm.has_weights:
        over = over.withColumn("weight", F.lit(1.0))
    w_raw = (F.col("rel_area") * F.col("weight")).alias("_w")
    ov = over.select("poly_idx", "pix_idx", w_raw)

    v = F.col(value_col)

    # 1. all-NaN pixels per (pix[, var]) — for_loop's `.all(other_dims)`
    #    mask (core.py:812); narrow aggregate, usually ~empty
    allnan = (pix_values
              .groupBy("pix_idx", *vkeys)
              .agg(F.max(F.when(_finite(v), 1).otherwise(0)).alias("_af"))
              .filter(F.col("_af") == 0)
              .select("pix_idx", *vkeys))

    # 2. per-polygon totals from the overlap table alone (map-side partials)
    tot = ov.groupBy("poly_idx").agg(F.sum("_w").alias("_tot"),
                                     F.count(F.lit(1)).alias("_n_rows"))

    # 3. weight/count of all-NaN pixels per (poly[, var]) — tiny join
    nanw = (ov.join(F.broadcast(allnan), "pix_idx")
              .groupBy("poly_idx", *vkeys)
              .agg(F.sum("_w").alias("_nanw"),
                   F.count(F.lit(1)).alias("_n_nan")))

    # 4. fact ⨝ overlaps on pix_idx.  When the overlap side fits a
    #    broadcast, the fact table never shuffles at all and the final
    #    aggregate is map-side partial + a tiny reduce.  The decision uses
    #    the row count CARRIED on the WeightMap (pixel_overlaps/read_wm set
    #    it) — never an eager count() here, which would re-execute the
    #    whole overlap DAG when the caller did not persist it.
    if broadcast_overlaps is None:
        n_rows = getattr(wm, "n_rows", None)
        broadcast_overlaps = (n_rows is not None
                              and n_rows <= BROADCAST_OVERLAPS_MAX_ROWS)
    joined = pix_values.join(F.broadcast(ov) if broadcast_overlaps else ov,
                             "pix_idx")

    res = (joined.groupBy("poly_idx", *dims)
                 .agg(F.sum(F.when(_finite(v), v * F.col("_w"))).alias("_s")))

    # attach denominators / valid counts from the tiny broadcast tables:
    # denom = tot - nanw  (== sum over valid pixels; normalize drop_na,
    # auxfuncs.py:10-53); NaN result when no valid pixels; 0.0 when valid
    # pixels exist but every term was NaN or denom == 0 (xarray skipna sum)
    res = (res.join(F.broadcast(tot), "poly_idx")
              .join(F.broadcast(nanw), ["poly_idx"] + vkeys, "left")
              .withColumn("_denom", F.col("_tot") - F.coalesce("_nanw", F.lit(0.0)))
              .withColumn("_n_valid",
                          F.col("_n_rows") - F.coalesce("_n_nan", F.lit(0)))
              .withColumn(
                  value_col,
                  F.when(F.col("_n_valid") == 0, _nan())
                   .when(F.col("_denom") == 0.0, F.lit(0.0))
                   .otherwise(F.coalesce(F.col("_s") / F.col("_denom"),
                                         F.lit(0.0))))
              .select("poly_idx", *dims, value_col))

    # outer merge onto polygon attrs (reference J3, core.py:533-538): keep
    # zero-overlap polygons with NaN values for every dim combination.
    # dim_space comes from the (tiny) result, not another fact-table scan.
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
