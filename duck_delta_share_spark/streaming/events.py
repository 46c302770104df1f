"""Streaming pipelines over the events table.

Batch/stream parity: ``windowed_counts`` is the streaming twin of the
batch query ``events_windowed_agg`` (plans/functions_sweep.py) — same
logical aggregation, executed incrementally with a watermark for late
data. At scale this runs as a continuous job over a file/kafka source with
state in the checkpoint; here tests drive it with ``availableNow`` over
the parquet fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture with ts normalized to a
    proper timestamp, matching the batch catalog loader exactly.

    File streams require an explicit schema; we probe the fixture's physical
    type with a batch schema-inference read (footer only, no data scan) and
    mirror catalog.load_table's defensive handling: TIMESTAMP(NANOS) files
    arrive as long ns under nanosAsLong and get the ns→µs floor;
    TIMESTAMP(MICROS) files pass through.
    """
    path = sf_dir.rstrip("/")
    inferred = spark.read.parquet(f"{path}/events.parquet").schema
    raw = (
        spark.readStream.schema(inferred)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(path)
    )
    if isinstance(inferred["ts"].dataType, LongType):
        # same ns→µs floor as catalog.load_table (pre-1970 rounds DOWN)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
        )
    # TIMESTAMP(MICROS) infers as timestamp_ntz; watermarks are only legal
    # on TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — the session runs
    # in UTC so the cast is value-preserving.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windows per event type with a late-data watermark.
    State size is bounded by (windows in watermark horizon × event types);
    Spark drops state for windows older than the watermark."""
    from duck_delta_share_spark.plans.registry import dsum

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # same exact-decimal discipline as the batch twin
            # events_windowed_agg: a raw double sum would drift with
            # partition order and type-mismatch the twin
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str = "events_windowed",
    output_mode: str = "complete",
) -> None:
    """Drain all available input (batch-like execution of the streaming
    plan) into an in-memory sink for inspection/tests. ``complete`` for
    aggregations; pass ``append`` for row streams (dedup/map pipelines)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_to_partitioned_parquet(
    stream_df: DataFrame,
    path: str,
    partition_by: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """foreachBatch sink: each micro-batch lands as hive-partitioned
    parquet through the batch write path (sinks.write_partitioned), giving
    the streaming job the same layout/small-file discipline as batch
    backfills — the lambda-architecture-free pattern: one write path for
    both.

    Idempotent per epoch (exactly-once output): every batch writes under a
    trailing ``__batch_id=<id>`` partition level with DYNAMIC partition
    overwrite, so a micro-batch replayed after a failure between the write
    and the checkpoint commit REWRITES its own subdirectories instead of
    appending duplicates (the standard foreachBatch exactly-once recipe;
    plain append here would be at-least-once).

    Returns the started StreamingQuery; callers own awaitTermination.
    """
    from pyspark.sql import functions as F

    from duck_delta_share_spark import sinks

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sinks.write_partitioned(
            batch_df.withColumn("__batch_id", F.lit(batch_id)),
            path,
            [*partition_by, "__batch_id"],
            mode="overwrite",
            options={"partitionOverwriteMode": "dynamic"},
        )

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
