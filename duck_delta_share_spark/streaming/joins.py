"""Stream-stream joins: event attribution (purchase ← preceding click by
the same user within a horizon) — the canonical interval join Structured
Streaming supports with bounded state.

Both sides carry watermarks and the join condition bounds event time on
both sides, so Spark can evict state: a click is dropped once the
watermark passes click_ts + horizon (no future purchase can match it), a
purchase once its own watermark passes. State size ≈ arrival rate ×
(watermark + horizon), independent of stream history — the property that
makes this runnable forever at 100 TB/day.

``attribution_batch`` is the same logical join on a static DataFrame —
the cross-check used by tests (streaming inner interval joins emit exactly
the batch result once drained).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sides(events: DataFrame, watermark: str | None):
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if watermark:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return clicks, purchases


def _attribution_join(
    clicks: DataFrame, purchases: DataFrame, horizon_minutes: int
) -> DataFrame:
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return purchases.join(clicks, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "purchase_value",
    )


def attribution_stream(
    events: DataFrame, watermark: str = "2 hours", horizon_minutes: int = 60
) -> DataFrame:
    """Streaming interval join; ``events`` must be a streaming DataFrame."""
    clicks, purchases = _sides(events, watermark)
    return _attribution_join(clicks, purchases, horizon_minutes)


def attribution_batch(events: DataFrame, horizon_minutes: int = 60) -> DataFrame:
    """Batch twin of :func:`attribution_stream` (same logical join)."""
    clicks, purchases = _sides(events, None)
    return _attribution_join(clicks, purchases, horizon_minutes)
