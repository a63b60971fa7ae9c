"""Structured Streaming ingest for image-tile tables.

The reference is batch-only (SURVEY §2.10) — this is the engine's scale
extension: tiles arriving as a stream (file source / Kafka at production)
are decoded statelessly (mapInPandas is streaming-safe) and aggregated
per-polygon with the PRECOMPUTED weightmap (a static broadcast side), via
foreachBatch so each micro-batch reuses the exact batch semantics (§2.8).

Per-micro-batch output = per-polygon weighted mean of the tiles in that
batch, appended to a parquet sink with the batch id — a tumbling
processing-time window.  Event-time watermarking would hang on a `ts`
column the same way (groupBy(window(ts), poly_idx)); the synthetic table
has no event time, so the surface exercised here is the
decode->join->aggregate streaming plan and exactly-once sink behavior via
checkpointing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..grid import GridSpec
from ..operators.aggregate import aggregate
from ..operators.overlaps import tiles_to_pixels

IMAGE_SCHEMA = ("image_id string, bytes binary, w int, h int, "
                "fmt string, caption string, phash long")


def stream_decode(spark: SparkSession, source_dir: str, grid: GridSpec,
                  max_files_per_trigger: int = 8) -> DataFrame:
    """Streaming tile decode: file-source stream of image parquet ->
    long pixel values (stateless, streaming-safe)."""
    stream = (spark.readStream.schema(IMAGE_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(source_dir))
    return tiles_to_pixels(stream, grid)


EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double")


def stream_events_hourly(spark: SparkSession, source_dir: str, out_dir: str,
                         checkpoint_dir: str, watermark: str = "2 hours",
                         max_files_per_trigger: int = 1):
    """Event-time tumbling-window aggregate with a WATERMARK: the streaming
    twin of the batch `events_hourly` query.  Append output mode — a
    window's row is emitted only once the watermark passes its end, and an
    event arriving later than `watermark` behind the max seen ts is
    DROPPED (late-data semantics).  Returns the StreamingQuery."""
    ev = (spark.readStream.schema(EVENT_SCHEMA)
          .option("maxFilesPerTrigger", max_files_per_trigger)
          .parquet(source_dir))
    agg = (ev.withWatermark("ts", watermark)
             .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 4).alias("sum_value"))
             .select(F.col("win.start").alias("hour_start"),
                     "event_type", "n", "sum_value"))
    return (agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stream_sessions(spark: SparkSession, source_dir: str, out_dir: str,
                    checkpoint_dir: str, gap: str = "1 hour",
                    watermark: str = "2 hours",
                    max_files_per_trigger: int = 1):
    """Event-time SESSION windows with a watermark: the streaming twin of
    the batch `operators.sessions.sessionize`.  Both use the same
    half-open extension rule (an event extends its session to [ts,
    ts+gap); the next event merges iff it lands strictly inside), so
    per-key session counts agree between the two — pinned in tests from
    both directions.  Append output mode: a session's single row
    (start/end/n_events/sum_value) is emitted only once the watermark
    passes its close, and events later than `watermark` behind the max
    seen ts are dropped.  State per in-flight session is one merged
    window — constant per session, independent of corpus size.  Returns
    the StreamingQuery."""
    ev = (spark.readStream.schema(EVENT_SCHEMA)
          .option("maxFilesPerTrigger", max_files_per_trigger)
          .parquet(source_dir))
    agg = (ev.withWatermark("ts", watermark)
             .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 4).alias("sum_value"))
             .select(F.col("win.start").alias("session_start"),
                     F.col("win.end").alias("session_end"),
                     "user_id", "n_events", "sum_value"))
    return (agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stream_aggregate(spark: SparkSession, source_dir: str, grid: GridSpec,
                     wm, out_dir: str, checkpoint_dir: str,
                     max_files_per_trigger: int = 8):
    """Run the per-polygon weighted aggregate on each micro-batch of tiles,
    appending (batch_id, poly_idx, dims..., value) to a parquet sink.

    Returns the StreamingQuery; caller awaits/stops it.  Restart with the
    same checkpoint_dir resumes exactly-once from the last committed batch.
    """
    pix_stream = stream_decode(spark, source_dir, grid, max_files_per_trigger)

    def process(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        out = aggregate(batch_df, wm, dims=("var", "t"))
        (out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append").parquet(out_dir))

    return (pix_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
