"""Stateful streaming dedup: cross-micro-batch exact deduplication with
``applyInPandasWithState`` (the custom-stateful-operator surface of
Structured Streaming).

Documents stream in (file source here; Kafka in production), are hashed to
a content digest, and partitioned into ``n_groups`` state groups by digest
hash.  Each group keeps the set of digests it has ever seen as its state;
only FIRST occurrences are emitted.  State survives restarts through the
checkpoint, so a re-sent duplicate is suppressed even across job restarts —
exactly the dedup-at-ingest shape a training-data pipeline needs (the batch
twin is operators.dedup.exact_dedup, oracle-checked).

Scale notes: state size is bounded per group (digests only, not documents);
groups = shuffle keys, so state is distributed and the shuffle is bounded
by n_groups x digest traffic.  At 10^12 documents swap the exact digest set
for a Bloom filter per group — same operator shape.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = "doc_id long, text string"
OUT_SCHEMA = "doc_id long, digest string, grp int"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(key, pdf_iter, state):
    seen = set(state.get[0]) if state.exists else set()
    parts = []
    for pdf in pdf_iter:
        mask = (~pdf["digest"].isin(seen)) & (~pdf["digest"].duplicated())
        parts.append(pdf.loc[mask, ["doc_id", "digest", "grp"]])
        seen.update(pdf["digest"])
    state.update((list(seen),))
    if parts:
        yield pd.concat(parts)


def stream_dedup_exact(spark: SparkSession, source_dir: str, out_dir: str,
                       checkpoint_dir: str, n_groups: int = 8,
                       max_files_per_trigger: int = 4):
    """Start the streaming dedup: parquet file-source -> digest ->
    per-group stateful first-occurrence filter -> parquet sink.  Returns
    the StreamingQuery (availableNow trigger: drains pending input, then
    stops).  Restarting with the same checkpoint restores the seen-set."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(source_dir))
    keyed = (stream.withColumn("digest", F.md5(F.col("text")))
                   .withColumn("grp", F.pmod(F.xxhash64("digest"),
                                             F.lit(n_groups)).cast("int")))
    deduped = (keyed.groupBy("grp")
               .applyInPandasWithState(_dedup_fn, OUT_SCHEMA, STATE_SCHEMA,
                                       "append",
                                       GroupStateTimeout.NoTimeout))
    return (deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
