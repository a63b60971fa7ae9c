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


def mixture_rates(counts: dict, target: dict,
                  budget: float | None = None) -> dict:
    """Per-source keep rates realizing a target domain mixture in
    expectation WITHOUT upsampling: the total kept size N is the largest
    value (capped by `budget`, if given) such that every source can
    supply its share — N = min_s counts[s] / target[s] — and then
    rate_s = target_s * N / counts_s.  Driver-side arithmetic over one
    tiny per-source count aggregate (#domains rows); the heavy lifting
    stays in `mixture_sample`'s map-only filter.

    Sources in `counts` but absent from `target` get no entry (dropped
    by the sampler); a target source missing from `counts` is an error
    (the mixture would be unreachable)."""
    if not target:
        raise ValueError("empty target mixture")
    for s, w in target.items():
        if w < 0:
            raise ValueError(f"negative target weight for {s!r}")
    total = sum(target.values())
    if total <= 0:
        raise ValueError("target weights must sum to a positive value")
    norm = {s: w / total for s, w in target.items()}
    missing = [s for s, w in norm.items() if w > 0 and not counts.get(s)]
    if missing:
        raise ValueError(f"target source(s) absent from counts: "
                         f"{sorted(missing)}")
    n = min(counts[s] / w for s, w in norm.items() if w > 0)
    if budget is not None:
        if budget <= 0:
            raise ValueError("budget must be positive")
        n = min(n, budget)
    return {s: (w * n / counts[s] if w > 0 else 0.0)
            for s, w in norm.items()}


def mixture_thresholds(rates: dict) -> list[tuple[str, str | None]]:
    """[(source, 8-hex-char upper threshold)] in sorted source order;
    None means keep-all (rate >= 1 must not lexicographically compare an
    8-char hash against the 9-char '100000000').  Shared with the SQL
    oracle so both engines embed bit-identical constants."""
    out = []
    for s in sorted(rates):
        r = rates[s]
        if not (0.0 <= r <= 1.0 + 1e-12):
            raise ValueError(f"keep rate for {s!r} outside [0, 1]: {r}")
        thr = None if r >= 1.0 else format(int(r * _HEX_SPACE), "08x")
        out.append((s, thr))
    return out


def mixture_sample(df: DataFrame, source_col: str, rates: dict,
                   id_col: str, salt: str = "") -> DataFrame:
    """Deterministic per-source Bernoulli downsampling to a target
    mixture: a row is kept iff the first 8 hex chars of
    md5(id || salt) fall below its source's rate threshold.  Rows whose
    source has no entry in `rates` are dropped.

    Pure column expression — map-only (zero shuffle) at 10^12 rows,
    deterministic under repartitioning and engine-portable (same
    contract as `hash_split`); rows with equal ids make correlated
    draws (dedup first), and changing `salt` redraws the sample."""
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8)
    expr = None
    for s, thr in mixture_thresholds(rates):
        keep = F.lit(True) if thr is None else (h < F.lit(thr))
        expr = (F.when(F.col(source_col) == s, keep) if expr is None
                else expr.when(F.col(source_col) == s, keep))
    expr = F.lit(False) if expr is None else expr.otherwise(F.lit(False))
    return df.filter(expr)


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
    if "split" in df.columns:
        raise ValueError("input already has a split column — re-splitting "
                         "would silently clobber the old assignment; drop "
                         "or rename it first")
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8)
    expr = None
    for name, thr in split_thresholds(weights):
        cond = h < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(weights[-1][0])
    return df.withColumn("split", expr)


def kfold(df: DataFrame, id_col: str, k: int = 5,
          salt: str = "") -> DataFrame:
    """Adds a `fold` column in [0, k) keyed only on md5(id || salt) —
    the cross-validation assignment.  Map-only (zero shuffle at 10^12
    rows), deterministic under repartitioning, engine-portable (the
    fold is the first 8 md5 hex chars as an integer mod k — identical
    arithmetic in any SQL engine).  Rows with equal ids land in the
    same fold (dedup first); changing `salt` redraws."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if "fold" in df.columns:
        raise ValueError("input already has a fold column — drop or "
                         "rename it first")
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8)
    return df.withColumn(
        "fold", (F.conv(h, 16, 10).cast("long") % k).cast("long"))


def stratified_sample(df: DataFrame, strata_cols, n_per_stratum: int,
                      id_col: str, salt: str = "") -> DataFrame:
    """EXACTLY n rows per stratum (fewer when a stratum is smaller) —
    the eval-set / human-review draw where Bernoulli's +-sqrt(n) jitter
    is not acceptable.  Deterministic and engine-portable: rows rank by
    md5(id || salt) hex within each stratum and ranks 1..n win.  Rows
    with EQUAL ids share a sort key, which makes the draw among them
    ambiguous (and id-NULL rows sort first) — dedup on id_col first, the
    same contract as `hash_split` / `mixture_sample`.

    One Exchange + Sort on the strata key.  The md5 key makes the sort
    order uniform-random per stratum, so a giant stratum costs its row
    count in sort, not in skewed collisions; n_per_stratum rows survive
    per task afterwards.  For very few, very large strata the two-phase
    trick (_topk_skew_safe) applies — use it when len(strata) is near 1.

    Adds `sample_rank` (1-based within stratum).  Changing `salt`
    redraws; the draw is stable under any input repartitioning.
    """
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    if "sample_rank" in df.columns:
        raise ValueError("input already has a sample_rank column")
    from pyspark.sql import Window
    sks = [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*sks).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("sample_rank", F.row_number().over(w))
              .filter(F.col("sample_rank") <= n_per_stratum))


def leakage_safe_split(df: DataFrame, id_col: str, components: DataFrame,
                       weights: list[tuple[str, float]] | None = None,
                       salt: str = "") -> DataFrame:
    """Split keyed on the near-dup COMPONENT instead of the document id,
    so no pair of near-duplicates straddles train/test — the eval
    leakage a doc-keyed split cannot prevent (two near-identical docs
    hash to independent splits ~18% of the time at 90/5/5).

    `components` is DataFrame["node", "component"] from
    `connected_components`; documents absent from it fall back to their
    own id as the key, which makes them split EXACTLY like `hash_split`
    at the same weights/salt (component = min member id, so a singleton
    component IS the doc id).  One shuffled left join on the id —
    AQE broadcasts the component table when it fits — then the same
    map-only threshold expression as `hash_split` on the key."""
    if "_split_key" in df.columns:
        raise ValueError("input already has a _split_key column "
                         "(reserved by leakage_safe_split)")
    comp = components.select(F.col("node").alias(id_col),
                             F.col("component").alias("_split_key"))
    joined = (df.join(comp, id_col, "left")
                .withColumn("_split_key",
                            F.coalesce("_split_key", F.col(id_col))))
    return hash_split(joined, "_split_key", weights, salt).drop("_split_key")
