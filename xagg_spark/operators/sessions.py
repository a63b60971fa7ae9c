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
    # exact integer microseconds for BOTH timestamp flavors; the NTZ
    # branch is wall-clock arithmetic, so the result never depends on
    # spark.sql.session.timeZone (unix_micros rejects NTZ outright)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        tus = F.expr(f"timestampdiff(MICROSECOND, "
                     f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)")
    else:
        tus = F.unix_micros(F.col(ts_col))
    prev = F.lag(tus).over(w)
    is_new = F.when(prev.isNull() | ((tus - prev) >= gap_us),
                    F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("_is_new", is_new)
              .withColumn("session_idx",
                          (F.sum("_is_new").over(wcum) - 1).cast("long"))
              .drop("_is_new"))
