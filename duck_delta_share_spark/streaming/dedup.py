"""Streaming deduplication — the ingest-side twin of the batch dedup
operators (operators/dedup.py). Two shapes:

- ``dedup_stream_exact`` — drop duplicate event ids within the watermark
  horizon (``dropDuplicatesWithinWatermark``): state holds one key per id
  seen inside the horizon and is evicted as the watermark advances, so
  state is bounded by (arrival rate × horizon), not stream history. This is
  the at-least-once → effectively-once ingest repair step.
- ``dedup_stream_content`` — same mechanics keyed on a content fingerprint
  (md5 of normalized text payload) instead of the id: near-ingest exact
  dedup for document streams.

At 100 TB/day the state store shards by key across executors; the horizon
choice is the memory/completeness dial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per id within the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols or ["event_id"]
    )


def dedup_stream_content(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per content fingerprint (normalized md5) —
    the SAME fingerprint as the batch dedup path (functions.text), so a
    doc deduped by the pipeline is deduped identically here."""
    from duck_delta_share_spark.functions.text import fingerprint

    fp = fingerprint(text_col)
    return (
        docs.withColumn("__fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
