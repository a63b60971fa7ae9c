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
                key: str = "pix_idx", check: bool = True) -> DataFrame:
    """Subset pix_values to the weightmap's pixels; raise ValueError when
    the weightmap needs pixels the data doesn't have (reference:
    "Was not able to match grids!", auxfuncs.py:558-567).

    The integrity check never shuffles the fact table: rows are first
    broadcast-SEMI-filtered to the weightmap's keys (rows outside the
    weightmap never leave their partition), then distinct-ed — per-
    partition partial aggregation bounds the shuffle at |wm keys| per
    partition.  Pass check=False to skip the parity raise entirely (the
    aggregate treats absent pixels as all-NaN anyway), e.g. on re-runs of
    an already-validated pipeline."""
    keys = wm_pixels.select(key).distinct()
    if check:
        present = (pix_values.join(F.broadcast(keys), key, "left_semi")
                   .select(key).distinct())
        missing = keys.join(present, key, "left_anti").count()
        if missing > 0:
            raise ValueError(
                f"Was not able to match grids! {missing} weightmap pixel(s) are "
                f"absent from the input data; the input grid must contain the "
                f"weightmap's grid.")
    return pix_values.join(F.broadcast(keys), key)


_VAR_DEFAULT = "__auto__"      # sentinel: use 'var' if present, else None


def warn_if_partial_nan(pix_values: DataFrame, dims=("t",),
                        value_col: str = "value",
                        var_col: str | None = _VAR_DEFAULT) -> bool:
    """True (+ SomeNanWarning) when pixels are inconsistently NaN along a
    non-loc dim — PER-DIM diagnosis naming the offending variable and
    dimension(s), matching the reference's _diagnose_nans/_warn_ifsomenans
    (/root/reference/xagg/auxfuncs.py:73-197):

    1. drop coordinates of each diagnosed dim that are all-NaN across
       everything else (reference ``dropna(dim, how='all')`` — an all-NaN
       slice is flagged separately and not a weights problem);
    2. a dim d is flagged for a variable when some (pixel, other-dim
       coords) point is NaN at some but not all d coordinates — exactly
       when for_loop and dot_product weights diverge (SURVEY §2.8).

    Cost: one hash aggregate per diagnosed dim (all map-side partials) —
    an opt-in diagnostic, not on the aggregate hot path."""
    missing = [d for d in dims if d not in pix_values.columns]
    if missing:
        raise ValueError(
            f"warn_if_partial_nan: dim column(s) {missing} not in the "
            f"input ({pix_values.columns}) — a silent skip here would "
            "report 'no partial NaNs' without having checked")
    if var_col == _VAR_DEFAULT:
        # sentinel default (ADVICE r4): frames WITHOUT a 'var' column get
        # the cross-variable diagnosis under defaults (pre-r4 behavior);
        # only an EXPLICITLY passed var_col that is absent raises below.
        var_col = "var" if "var" in pix_values.columns else None
    if var_col is not None and var_col not in pix_values.columns:
        # mirror the dims guard: a misspelled var_col must not silently
        # degrade the per-variable diagnosis to a cross-variable one
        # (ADVICE r3).  Pass var_col=None to diagnose across variables.
        raise ValueError(
            f"warn_if_partial_nan: var_col {var_col!r} not in the input "
            f"({pix_values.columns}) — pass var_col=None for a "
            "cross-variable diagnosis")
    dims = list(dims)
    vkeys = [var_col] if var_col else []
    v = F.col(value_col)
    df = pix_values.withColumn("_f", (~F.isnan(v) & v.isNotNull()).cast("int"))
    for d in dims:
        dead = (df.groupBy(*vkeys, d).agg(F.max("_f").alias("_m"))
                  .filter(F.col("_m") == 0).drop("_m"))
        df = df.join(dead, [*vkeys, d], "left_anti")
    df = df.persist()
    flagged: dict = {}                   # var -> [dims with partial NaNs]
    try:
        for d in dims:
            others = [x for x in dims if x != d]
            per = (df.groupBy("pix_idx", *vkeys, *others)
                     .agg(F.sum("_f").alias("nf"),
                          F.count(F.lit(1)).alias("nt")))
            part = per.filter((F.col("nf") > 0) & (F.col("nf") < F.col("nt")))
            if vkeys:
                for r in part.select(*vkeys).distinct().collect():
                    flagged.setdefault(str(r[0]), []).append(d)
            elif part.limit(1).count() > 0:
                flagged.setdefault("var", []).append(d)
    finally:
        df.unpersist()
    for var, bad in flagged.items():
        dimtxt = ", ".join(bad)
        # message shape (incl. the 'polgyon' typo) verbatim from the
        # reference, auxfuncs.py:169-176
        warnings.warn(
            "One or more grid cells in variable " + var
            + " have inconsistent nans along the dimension(s) " + dimtxt
            + " (i.e., one or more grid cells are nan for some but not all "
            "coordinates of the dimension(s)). This means that grid cell "
            "weights will be different for different coordinates along "
            + dimtxt + ". The aggregation calculation may therefore be "
            "incorrect, since it aggregates over different grid cells for "
            " the same polgyon for different coordinates of the dimension(s)"
            + dimtxt + ".", SomeNanWarning)
    return bool(flagged)
