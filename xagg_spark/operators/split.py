"""Deterministic train/val/test splitting for corpus pipelines.

A training-data pipeline must assign every document to exactly one split,
(a) deterministically — re-running the pipeline, adding executors, or
re-partitioning the input must not move any document between splits
(`df.randomSplit` fails this: it is partition-order dependent), and
(b) portably — any engine recomputing the assignment from the id gets
the same answer.

The assignment here is a pure column expression on a salted md5 of the
id: the first 8 hex chars of md5(id || salt) are compared
lexicographically against per-split threshold strings.  Lowercase hex
compares identically in every collation-sane engine (Spark, DuckDB,
Postgres...), the expression is JVM-side whole-stage-codegen'd (no
Python), and there is no shuffle at all — splitting 10^12 rows is a
map-only stage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_HEX_SPACE = 16 ** 8  # the compared prefix is 8 hex chars = 32 bits


def split_thresholds(weights: list[tuple[str, float]]) -> list[tuple[str, str]]:
    """[(split_name, upper_threshold_hex)] for all but the last split —
    a row belongs to the first split whose threshold its hash prefix is
    strictly below; the last split takes the remainder.  Shared with the
    SQL oracle so both engines embed bit-identical constants."""
    for name, w in weights:
        if w < 0:
            raise ValueError(f"negative split weight for {name!r}")
    total = sum(w for _, w in weights)
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out = []
    cum = 0.0
    for name, w in weights[:-1]:
        cum += w / total
        out.append((name, format(min(int(cum * _HEX_SPACE), _HEX_SPACE - 1),
                                 "08x")))
    return out


def hash_split(df: DataFrame, id_col: str,
               weights: list[tuple[str, float]] | None = None,
               salt: str = "") -> DataFrame:
    """Adds a `split` column assigning each row to exactly one named
    split with the requested proportions (in expectation), keyed only on
    md5(id || salt).  Default 90/5/5 train/val/test.

    Rows with equal ids always land in the same split (dedup first!);
    changing `salt` re-draws the whole assignment.
    """
    if weights is None:
        weights = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8)
    expr = None
    for name, thr in split_thresholds(weights):
        cond = h < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(weights[-1][0])
    return df.withColumn("split", expr)
