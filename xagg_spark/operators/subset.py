"""Grid alignment + NaN diagnostics (reference P3/J5 + A7).

subset_find (/root/reference/xagg/auxfuncs.py:512-573): subset a larger
pixel table to exactly the weightmap's grid; error if grids can't match.
Spark form: inner equi-join on pix key + anti-join count check.

warn_if_partial_nan (/root/reference/xagg/auxfuncs.py:73-197, SomeNanWarning
at core.py:735/803/877): warn once when a pixel is NaN for SOME but not all
non-loc coordinates — exactly when for_loop and dot_product semantics
diverge (SURVEY §2.8)."""

from __future__ import annotations

import warnings

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class SomeNanWarning(UserWarning):
    pass


def subset_find(pix_values: DataFrame, wm_pixels: DataFrame,
                key: str = "pix_idx") -> DataFrame:
    """Subset pix_values to the weightmap's pixels; raise ValueError when
    the weightmap needs pixels the data doesn't have (reference:
    "Was not able to match grids!", auxfuncs.py:558-567)."""
    keys = wm_pixels.select(key).distinct()
    missing = keys.join(pix_values.select(key).distinct(), key, "left_anti").count()
    if missing > 0:
        raise ValueError(
            f"Was not able to match grids! {missing} weightmap pixel(s) are "
            f"absent from the input data; the input grid must contain the "
            f"weightmap's grid.")
    return pix_values.join(F.broadcast(keys), key)


def warn_if_partial_nan(pix_values: DataFrame, dims=("t",),
                        value_col: str = "value",
                        var_col: str | None = "var") -> bool:
    """True (+ SomeNanWarning) if any pixel has partial NaNs along non-loc
    dims.  One aggregate: per pixel, count finite vs total — partial when
    0 < finite < total."""
    keys = ["pix_idx"] + ([var_col] if var_col else [])
    v = F.col(value_col)
    per_pix = (pix_values.groupBy(*keys)
               .agg(F.count(F.when(~F.isnan(v) & v.isNotNull(), 1)).alias("nf"),
                    F.count(F.lit(1)).alias("nt")))
    n_partial = per_pix.filter((F.col("nf") > 0) & (F.col("nf") < F.col("nt"))).count()
    if n_partial > 0:
        warnings.warn(
            f"{n_partial} pixel(s) have NaNs in some but not all non-location "
            f"coordinates; the aggregation weights are shared across those "
            f"coordinates (for_loop semantics), so partially-NaN steps are "
            f"not re-normalized.", SomeNanWarning)
        return True
    return False
