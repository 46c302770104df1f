"""Time-series queries over the ``events`` fixture: gap-filled resampling
(continuous-aggregate shape) and interval containment joins — both with
exact DuckDB oracles. Operators in ``operators/timeseries.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.timeseries import (
    interval_join_bucketed,
    resample_gapfill,
)
from duck_delta_share_spark.plans.registry import query


@query(
    "resample_gapfill_hourly",
    oracle="""
WITH rolled AS (
  SELECT event_type,
         CAST(to_timestamp(floor(epoch(ts) / 3600) * 3600) AS TIMESTAMP) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM rolled GROUP BY 1
), cal AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
)
SELECT c.event_type, c.bucket,
       COALESCE(r.n, 0) AS n,
       last_value(r.total_value IGNORE NULLS) OVER (
           PARTITION BY c.event_type ORDER BY c.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM cal c LEFT JOIN rolled r USING (event_type, bucket)
""",
    doc="Hourly resample per event_type with DENSE buckets and forward "
    "fill (operators/timeseries.py:resample_gapfill): one rollup shuffle, "
    "calendar generated per group from its own bounds (calendar-sized, "
    "never data-sized), per-group running last(ignorenulls) — the "
    "continuous-aggregate / hypertable-rollup shape",
)
def resample_gapfill_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return resample_gapfill(
        e, "ts", ["event_type"], "value", bucket_seconds=3600
    )


def _maintenance_windows(spark: SparkSession) -> DataFrame:
    """Thirty deterministic daily windows [06:00, 08:00) over the fixture's
    January span — generated from literals, broadcast-sized."""
    return spark.sql(
        """
        SELECT win_start, win_start + interval 2 hours AS win_end,
               date_format(win_start, 'yyyy-MM-dd') AS win_id
        FROM (SELECT explode(sequence(
                 timestamp_ntz'2024-01-01 06:00:00',
                 timestamp_ntz'2024-01-30 06:00:00',
                 interval 1 day)) AS win_start)
        """
    )


@query(
    "interval_join_events",
    oracle="""
WITH win AS (
  SELECT w AS win_start,
         w + INTERVAL 2 HOUR AS win_end,
         strftime(w, '%Y-%m-%d') AS win_id
  FROM (SELECT unnest(generate_series(
           TIMESTAMP '2024-01-01 06:00:00',
           TIMESTAMP '2024-01-30 06:00:00',
           INTERVAL 1 DAY)) AS w)
)
SELECT win_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM win JOIN events e ON e.ts >= win.win_start AND e.ts < win.win_end
GROUP BY win_id
ORDER BY win_id
""",
    doc="Interval containment join as a distributed HASH join "
    "(operators/timeseries.py:interval_join_bucketed): intervals explode "
    "to covered hour buckets, points map to one bucket, equi-join + "
    "residual predicate — no broadcast-nested-loop cross product; the "
    "oracle is the plain BETWEEN join",
)
def interval_join_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.plans.registry import dsum

    e = load_table(spark, sf_dir, "events")
    joined = interval_join_bucketed(
        e, _maintenance_windows(spark), "ts", "win_start", "win_end", 3600
    )
    return (
        joined.groupBy("win_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .orderBy("win_id")
    )
