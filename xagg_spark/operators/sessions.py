"""Event sessionization — gaps-and-islands session windows.

Assigns every event a per-key session index: a new session starts when
the gap to the key's previous event reaches `gap_seconds`.  The
boundary rule (`diff >= gap` starts a new session) matches Spark's
built-in `F.session_window` (an event extends the session to
[ts, ts + gap); the next event merges iff it lands strictly inside),
so the batch assignment agrees with the Structured-Streaming session
aggregation — tests cross-check the two.

Scale shape: identical to `pack_sequences` — one hash exchange on the
key column, per-key sort, two Window passes Catalyst runs over the
same sort (lag, then running sum).  No global sort; time arithmetic is
integer microseconds (`unix_micros`), so the boundary decision is
exact and engine-portable (DuckDB `epoch_us`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               gap_seconds: float, order_cols: tuple = ()) -> DataFrame:
    """Adds `session_idx` (0-based per key).  `order_cols` breaks ties
    between equal timestamps — pass a unique id column there, or the
    assignment is nondeterministic under repartitioning."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    if "_is_new" in df.columns:
        raise ValueError("input already has a _is_new column "
                         "(reserved by sessionize)")
    gap_us = int(round(gap_seconds * 1_000_000))
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tus = _ts_micros(df, ts_col)
    prev = F.lag(tus).over(w)
    is_new = F.when(prev.isNull() | ((tus - prev) >= gap_us),
                    F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("_is_new", is_new)
              .withColumn("session_idx",
                          (F.sum("_is_new").over(wcum) - 1).cast("long"))
              .drop("_is_new"))


def _ts_micros(df: DataFrame, ts_col: str):
    """Exact integer microseconds for both timestamp flavors, shared by
    every event-time operator in this module: the NTZ branch is
    wall-clock arithmetic, so the result never depends on
    spark.sql.session.timeZone (unix_micros rejects NTZ outright)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, "
                      f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)")
    return F.unix_micros(F.col(ts_col))


def asof_join(left: DataFrame, right: DataFrame, ts_col: str = "ts",
              by: str = "user_id", value_cols=("value",),
              tolerance_seconds: float | None = None,
              suffix: str = "_r") -> DataFrame:
    """Backward inclusive as-of join: every left row picks up the right
    row with the LARGEST right.ts <= left.ts for the same `by` key —
    the quotes-to-trades / state-at-event-time align Spark has no
    built-in for.  Matches DuckDB's native `ASOF LEFT JOIN ... ON
    l.by = r.by AND l.ts >= r.ts` (the oracle) and pandas
    `merge_asof(direction='backward')`.

    NOT implemented as a range join (O(n*m) per key at worst): both
    sides union with a source tag and ONE window pass per key carries
    the last-seen right payload forward — a single hash Exchange + Sort
    on (`by`), linear in rows, the 10^12-row shape.  A hot key
    concentrates its rows in one task (same caveat as sessionize).

    Ordering at equal timestamps: right rows sort BEFORE left rows at
    the same ts (inclusive semantics).  Rows with equal (by, ts) on the
    RIGHT side make the pick among them ambiguous — deduplicate the
    right side to one row per (by, ts) first (same contract as DuckDB
    ASOF, which is defined on unique right timestamps).  The matched
    right row is carried as ONE struct, so a NULL in a matched row's
    payload comes through as NULL (never silently replaced by a stale
    older value, and multi-column payloads can never mix rows).  NULL
    `by`/`ts` on the right never match (SQL equality/comparison
    semantics); NULL-key left rows come back unmatched.

    `tolerance_seconds` nulls the carried payload when the match is
    staler than the window (exact integer-microsecond comparison,
    engine-portable).  Output: every left row/column plus one
    `<col><suffix>` per value col and `<ts_col><suffix>` (the matched
    right timestamp, NULL when no match / out of tolerance).
    """
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    if tolerance_seconds is not None and tolerance_seconds < 0:
        raise ValueError("tolerance_seconds must be >= 0")
    clash = {f"{c}{suffix}" for c in value_cols + [ts_col]}
    clash &= set(left.columns)
    if clash:
        raise ValueError(f"left already has column(s) {sorted(clash)} — "
                         "pass a different suffix")
    for c in (by, ts_col, *value_cols):
        if c not in right.columns:
            raise ValueError(f"right side lacks column {c!r}")
    reserved = {"_src", "_rpay"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"input already has column(s) {sorted(reserved)} "
                         "(reserved by asof_join)")
    left_rest = [c for c in left.columns if c not in (by, ts_col)]
    # union schema: by, ts, _src, left payload (NULL on right rows), and
    # the right row as ONE nullable struct `_rpay` — last(ignorenulls)
    # then skips left rows but carries whole right rows even when some
    # payload FIELD is NULL (per-column carries would resurrect stale
    # values and could mix fields from different right rows)
    rv = (right
          # NULL by/ts never match under SQL comparison semantics
          .filter(F.col(by).isNotNull() & F.col(ts_col).isNotNull())
          .select(
              F.col(by), F.col(ts_col), F.lit(0).alias("_src"),
              *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                for c in left_rest],
              F.struct(*[F.col(c).alias(c) for c in value_cols],
                       F.col(ts_col).alias("__match_ts")).alias("_rpay")))
    lv = left.select(
        F.col(by), F.col(ts_col), F.lit(1).alias("_src"),
        *[F.col(c) for c in left_rest],
        F.lit(None).cast(rv.schema["_rpay"].dataType).alias("_rpay"))
    u = lv.unionByName(rv)
    w = (Window.partitionBy(by).orderBy(F.col(ts_col).asc(),
                                        F.col("_src").asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carry = F.last("_rpay", ignorenulls=True).over(w)
    out = (u.select(by, ts_col, "_src", *left_rest,
                    *[carry[c].alias(f"{c}{suffix}") for c in value_cols],
                    carry["__match_ts"].alias(f"{ts_col}{suffix}"))
            .filter(F.col("_src") == 1).drop("_src"))
    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        lts = _ts_micros(out, ts_col)
        rts_col = f"{ts_col}{suffix}"
        if dict(out.dtypes).get(rts_col) == "timestamp_ntz":
            rts = F.expr(f"timestampdiff(MICROSECOND, "
                         f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{rts_col}`)")
        else:
            rts = F.unix_micros(F.col(rts_col))
        stale = rts.isNull() | ((lts - rts) > tol_us)
        for c in value_cols + [ts_col]:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")))
    return out.select(*left.columns,
                      *[f"{c}{suffix}" for c in value_cols + [ts_col]])


def rolling_stats(df: DataFrame, key_col: str, ts_col: str,
                  value_col: str = "value",
                  window_seconds: float = 600.0) -> DataFrame:
    """Trailing event-time window per key: for every row, the sum /
    count / mean of `value_col` over [ts - window, ts] for the same key
    — the per-entity rate/velocity feature every event pipeline derives.

    RANGE frame over exact integer microseconds, so (a) the boundary is
    engine-portable (DuckDB `RANGE BETWEEN n PRECEDING`), and (b) rows
    with EQUAL (key, ts) are all inside each other's frame regardless of
    sort-tie order — the result is deterministic under repartitioning
    with no tie-break column needed (unlike ROWS frames).

    Scale shape: one hash Exchange on the key + one per-key Sort; both
    window aggregates ride the same frame.  Hot keys concentrate (same
    caveat as sessionize); the frame is O(events-in-window) state per
    row, never a self-join.

    Adds roll_sum, roll_n, roll_mean.  roll_n counts NON-NULL values
    (so roll_mean is the mean of the values actually present in the
    window); an all-NULL window yields roll_sum/roll_mean NULL and
    roll_n = 0.
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    clash = {"roll_sum", "roll_n", "roll_mean", "_tus"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has column(s) {sorted(clash)} "
                         "(reserved by rolling_stats)")
    win_us = int(round(window_seconds * 1_000_000))
    out = df.withColumn("_tus", _ts_micros(df, ts_col))
    w = (Window.partitionBy(key_col).orderBy(F.col("_tus").asc())
               .rangeBetween(-win_us, 0))
    return (out.withColumn("roll_sum", F.sum(value_col).over(w))
               .withColumn("roll_n", F.count(value_col).over(w)
                            .cast("long"))
               .withColumn("roll_mean",
                           F.try_divide(F.col("roll_sum"),
                                        F.col("roll_n")))
               .drop("_tus"))


def interval_join(points: DataFrame, intervals: DataFrame,
                  ts_col: str = "ts", start_col: str = "start",
                  end_col: str = "end", by: str | None = None,
                  bucket_seconds: float = 3600.0,
                  max_buckets_per_interval: int = 10_000) -> DataFrame:
    """Point-in-interval inner join (half-open: start <= ts < end) —
    the enrich-events-with-campaign/session/deployment-window operator.

    NOT a range join (Catalyst plans `ON s <= ts AND ts < e` as a
    nested-loop / broadcast range join — O(points x intervals) per key):
    intervals EXPLODE into the fixed-width time buckets they cover
    (JVM sequence/explode on integer microseconds), points map to their
    single bucket, and the join is a plain EQUI-join on ([by,] bucket)
    with the exact containment as a residual filter.  Each qualifying
    pair meets in exactly one bucket (the point's), so no dedup pass.
    Shuffle volume: points + intervals x ceil(len/bucket) rows, hash-
    partitioned — the standard scale trade: pick `bucket_seconds` near
    the typical interval length (cost ~2 rows per interval), and the
    guard raises when an interval would explode past
    `max_buckets_per_interval` instead of silently fanning out.

    Output: every point column + every interval column (start/end and
    payload).  Points in no interval drop (inner join).
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    overlap = (set(points.columns) & set(intervals.columns)) - {by}
    if overlap:
        raise ValueError(f"points and intervals share column(s) "
                         f"{sorted(overlap)} — rename before joining")
    reserved = ({"_tus", "_sus", "_eus", "_bucket"}
                & (set(points.columns) | set(intervals.columns)))
    if reserved:
        raise ValueError(f"input already has column(s) {sorted(reserved)} "
                         "(reserved by interval_join)")
    b_us = int(round(bucket_seconds * 1_000_000))

    def _fdiv(sql_expr: str):
        # exact integer FLOOR division (div truncates toward zero and a
        # double round-trip loses exactness past 2^53 microseconds —
        # both wrong for pre-1970 NTZ timestamps)
        q = F.expr(f"({sql_expr}) div {b_us}")
        r = F.expr(f"({sql_expr}) % {b_us}")
        return F.when(r < 0, q - 1).otherwise(q)

    pts = points.withColumn("_tus", _ts_micros(points, ts_col))
    iv = (intervals
          .withColumn("_sus", _ts_micros(intervals, start_col))
          .withColumn("_eus", _ts_micros(intervals, end_col)))
    iv = iv.filter(F.col("_eus") > F.col("_sus"))   # empty intervals drop
    n_b = _fdiv("_eus - 1") - _fdiv("_sus") + 1
    # eager fail-fast guard: one cheap aggregate job over the (dimension-
    # side) interval table, instead of silently shuffling a huge fan-out
    worst = iv.agg(F.max(F.when(n_b > max_buckets_per_interval, n_b))
                   ).collect()[0][0]
    if worst is not None:
        raise ValueError(
            f"an interval spans {worst} buckets "
            f"(> max_buckets_per_interval={max_buckets_per_interval}); "
            f"raise bucket_seconds (currently {bucket_seconds}) or the cap")
    iv = iv.withColumn(
        "_bucket", F.explode(F.sequence(_fdiv("_sus"), _fdiv("_eus - 1"))))
    pts = pts.withColumn("_bucket", _fdiv("_tus"))
    keys = ([by] if by else []) + ["_bucket"]
    joined = (pts.join(iv, keys)
                 .filter((F.col("_sus") <= F.col("_tus"))
                         & (F.col("_tus") < F.col("_eus"))))
    return joined.drop("_tus", "_sus", "_eus", "_bucket")


def funnel(df: DataFrame, steps, key_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           order_cols: tuple = ()) -> DataFrame:
    """Conversion-funnel completion per key: scanning the key's events in
    timeline order, greedily match `steps` (a list of event types) in
    order — step k matches the earliest unconsumed event of its type
    after step k-1's match IN TIMELINE POSITION (so same-timestamp
    chains complete: a@t0 then b@t0 is a 2-step funnel).  Greedy-earliest
    is optimal for unwindowed funnels (an exchange argument: any
    completion can be rewritten step-by-step onto the earliest choices),
    so `n_completed` is the true maximum prefix.

    One hash Exchange on the key, then pure JVM higher-order functions:
    sort_array(collect_list(struct)) builds the per-key timeline and ONE
    F.aggregate left-fold walks it with a (step-index, step-timestamps)
    accumulator — "after the previous match" is positional, free in a
    left-fold, so no last-position state, no window, no self-joins (the
    k-step self-join formulation shuffles k times and explodes on hot
    keys), no Python.  Per-key event lists must fit a task (same bound
    as any collect_list sessionization; 10^6 events/key is fine).

    `order_cols` orders ties between equal timestamps (any orderable
    types, compared in struct order after the timestamp); without it,
    equal-timestamp events order by event type — deterministic, but
    which of two different-type ties is "first" is then alphabetical,
    not causal.  Events with a NULL timestamp are DROPPED (they have no
    position on the timeline).  Repeated types in `steps` are allowed
    (e.g. view -> view -> buy).
    Returns (key_col, n_completed, step_1_us .. step_N_us) — step match
    times in integer microseconds, NULL past the last completed step.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    df = df.filter(F.col(ts_col).isNotNull())
    ev = df.select(
        F.col(key_col),
        F.struct(_ts_micros(df, ts_col).alias("tus"),
                 *[F.col(c).alias(f"_o{i}")
                   for i, c in enumerate(order_cols)],
                 F.col(type_col).alias("ty")).alias("e"))
    per_key = ev.groupBy(key_col).agg(
        F.array_sort(F.collect_list("e")).alias("es"))
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).alias("k"),
        F.array(*[F.lit(None).cast("long") for _ in range(n)]).alias("s"))

    def _step(acc, e):
        matches = ((acc["k"] < n)
                   & (e["ty"] == F.element_at(steps_arr, acc["k"] + 1)))
        advanced = F.struct(
            (acc["k"] + 1).alias("k"),
            F.transform(acc["s"],
                        lambda x, i: F.when(i == acc["k"], e["tus"])
                                      .otherwise(x)).alias("s"))
        return F.when(matches, advanced).otherwise(acc)

    acc = F.aggregate(F.col("es"), init, _step)
    return per_key.select(
        key_col,
        acc["k"].cast("long").alias("n_completed"),
        *[F.element_at(acc["s"], i + 1).alias(f"step_{i + 1}_us")
          for i in range(n)])
