"""Time-series queries over the ``events`` fixture: gap-filled resampling
(continuous-aggregate shape) and interval containment joins — both with
exact DuckDB oracles. Operators in ``operators/timeseries.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.timeseries import (
    ewma,
    interval_join_bucketed,
    resample_gapfill,
    twap,
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


@query(
    "ewma_hourly",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), seqs AS (
  SELECT event_type, list_sort(list({'h': h, 's': s, 'n': n})) AS seq
  FROM hourly GROUP BY 1
)
SELECT event_type, u.r['h'] AS bucket, round(u.r['e'], 6) AS ewma FROM (
  SELECT event_type,
         unnest(list_transform(generate_series(1, len(seq)), i ->
           {'h': seq[CAST(i AS INTEGER)]['h'],
            'e': list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(seq[1:CAST(i AS INTEGER)],
                                    y -> y['s'] / y['n'])),
                   (acc, v) -> acc * 0.7 + 0.3 * v)})) AS r
  FROM seqs) u
""",
    doc="per-type hourly EWMA (operators/timeseries.py:ewma): "
    "decimal-exact bucket means, then the recursive fold "
    "s_t = 0.7*s_{t-1} + 0.3*x_t as a LINEAR Arrow scan per key (no "
    "window frame can express it; prefix-refolds would be O(n^2)); the "
    "oracle replays the identical pinned-order fold with list_reduce — "
    "bit-exact before the display rounding",
)
def ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = ewma(e, "ts", ["event_type"], "value", alpha=0.3, bucket_seconds=3600)
    return out.select("event_type", "bucket", F.round("ewma", 6).alias("ewma"))


@query(
    "window_rolling_median",
    oracle="""
SELECT event_type, event_id, value,
       median(value) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS med10,
       min(value) OVER (PARTITION BY event_type ORDER BY event_id
                        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS min10,
       max(value) OVER (PARTITION BY event_type ORDER BY event_id
                        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS max10
FROM events WHERE event_id % 17 = 0
""",
    doc="rolling EXACT median (+min/max) over a 10-row frame per type — "
    "Spark's percentile(value, 0.5) as a WINDOW aggregate vs DuckDB "
    "median(): both interpolate even-count middles identically, so the "
    "robust-smoothing primitive is hash-checked, not approximated. "
    "SCALE NOTE: the per-type window holds a type's whole sampled "
    "history in one task — fine while per-key history is bounded; for "
    "unbounded histories the production shape is time-bucketed windows "
    "with frame-width overlap replication (not used here because sparse "
    "buckets let a 10-row frame span multiple buckets, breaking the "
    "bit-exact oracle contract this query exists to pin)",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where("event_id % 17 = 0")
    frame = (
        "OVER (PARTITION BY event_type ORDER BY event_id "
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)"
    )
    return e.selectExpr(
        "event_type",
        "event_id",
        "value",
        f"percentile(value, 0.5) {frame} AS med10",
        f"min(value) {frame} AS min10",
        f"max(value) {frame} AS max10",
    )


@query(
    "twap_hourly",
    oracle="""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS tus, value,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS bucket
  FROM events
),
o AS (
  SELECT event_type, bucket, tus, value,
         LEAD(tus) OVER (PARTITION BY event_type, bucket
                         ORDER BY tus, value NULLS FIRST) AS nxt
  FROM e
),
w AS (
  SELECT event_type, bucket, value,
         COALESCE(nxt, (bucket + 1) * 3600000000) - tus AS dt
  FROM o
)
SELECT event_type,
       CAST(to_timestamp(bucket * 3600) AS TIMESTAMP) AS bucket_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       floor(CAST(SUM(CAST(value AS DECIMAL(18,6)) * dt) AS DOUBLE)
             / NULLIF(SUM(dt), 0) * 1000000.0 + 0.5) / 1000000.0 AS twap
FROM w
GROUP BY event_type, bucket
ORDER BY event_type, bucket
""",
    doc="SCALE NOTE: window partitions are (type, hour); fixture "
    "timestamps span a FIXED month so per-partition density grows with "
    "SF, but a production event stream grows along TIME — per-(type, "
    "hour) rows are bounded by arrival rate, the natural partitioning "
    "assumption. "
    "hourly TWAP per event_type (operators/timeseries.py:twap — the "
    "time-weighted rollup irregular series need; a plain AVG weights a "
    "59-minute holding equal to a 1-second one): each value is weighted "
    "by microseconds held until the next observation in the bucket, the "
    "last until bucket end. ONE window pass + ONE agg on the SAME "
    "(type, bucket) key — the exchange is reused, integer time axis, "
    "exact-decimal weighted sums, all in NTZ space (no session-tz "
    "dependence)",
)
def twap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return twap(e, "ts", ["event_type"], "value", bucket_seconds=3600).orderBy(
        "event_type", "bucket_ts"
    )


@query(
    "ohlc_bars_hourly",
    oracle="""
WITH e2 AS (
  SELECT event_type,
         date_trunc('hour', ts) AS bucket_ts,
         value,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
)
SELECT event_type, bucket_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(CASE WHEN rn = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rd = 1 THEN value END) AS close
FROM e2 GROUP BY event_type, bucket_ts
""",
    doc="OHLC candle bars per (event_type, hour) — the classic "
    "downsampling rollup every metrics/financial pipeline ships (open = "
    "first value in the bar, close = last, high/low = extremes). "
    "Open/close need a TOTAL order: ties on ts break by event_id via "
    "two ROW_NUMBERs over the SAME (type, hour) partitioning, so one "
    "exchange feeds both sorts and the final hash agg (Spark reuses the "
    "window shuffle for the groupBy on the same key). Values pass "
    "through raw (no arithmetic) — hash-exact by construction. SCALE "
    "NOTE: partitions are (type, hour); production streams grow along "
    "TIME so per-partition rows stay bounded by arrival rate.",
)
def ohlc_bars_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlc_bars_core(load_table(spark, sf_dir, "events"))


def ohlc_bars_core(e: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    from pyspark.sql import Window

    # bucket materializes FIRST so the windows and the final agg key on
    # the same attribute — partitioning by the date_trunc EXPRESSION
    # while grouping on its alias re-shuffles (plan audit r8: 2
    # exchanges → 1)
    base = e.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        "value",
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("event_type", "bucket_ts").orderBy(
        "ts", "event_id"
    )
    wd = Window.partitionBy("event_type", "bucket_ts").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        base.select(
            "event_type",
            "bucket_ts",
            "value",
            F.row_number().over(wa).alias("rn"),
            F.row_number().over(wd).alias("rd"),
        )
        .groupBy("event_type", "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rd") == 1, F.col("value"))).alias("close"),
        )
    )
