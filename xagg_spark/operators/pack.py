"""Sequence packing for LLM pretraining corpora.

GPT-style pretraining concatenates documents within a shard and cuts the
stream into fixed-size context windows.  `pack_sequences` computes, per
document, which window (chunk) its first token lands in and at what
offset — the assignment a packing writer needs to lay out training
examples, without materializing the concatenated stream.

Scale shape: one window aggregation PARTITIONED BY the shard column —
shards (source, file, bucket...) are the parallelism unit, so there is
no global sort and no single-partition window; a 10^12-token corpus
packs as thousands of independent shard windows.  The cumulative sum is
JVM whole-stage-codegen'd; no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   budget: int, shard_col: str) -> DataFrame:
    """Adds `chunk` (window index within the shard's concatenated token
    stream) and `offset` (token position within that window) for each
    document, deterministic in (shard, id) order.  Documents longer than
    the remaining window space straddle the boundary — exactly the
    concat-then-chunk semantics of pretraining packing."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if "_cum_prev" in df.columns:
        raise ValueError("input already has a _cum_prev column "
                         "(reserved by pack_sequences)")
    w = (Window.partitionBy(shard_col).orderBy(id_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    cum_prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    # integer div, not floor(double/) — a shard's cumulative token count
    # can exceed 2^53 at corpus scale and doubles would round it
    return (df.withColumn("_cum_prev", cum_prev.cast("long"))
              .withColumn("chunk", F.expr(f"_cum_prev div {int(budget)}"))
              .withColumn("offset", (F.col("_cum_prev") % budget).cast("long"))
              .drop("_cum_prev"))
