"""Time-series operators over event streams: resample + gap-fill (the
hypertable-rollup / continuous-aggregate shape) and a bucketized interval
join (range join without a cross product).

100 TB design notes:

- ``resample_gapfill``: the rollup is one groupBy shuffle on
  (group, bucket); the calendar densification generates each group's
  bucket sequence FROM the group's own min/max (one row per group before
  the explode), so the join back is calendar-sized, never data-sized.
  Forward fill is a per-group running ``last(ignorenulls)`` window —
  partitioned by group, no global window anywhere.
- ``interval_join_bucketed``: interval containment (point BETWEEN lo AND
  hi) is not an equi-join, and Spark's fallback is a broadcast-nested-loop
  — quadratic and driver-bound at scale. Bucketizing makes it one: each
  interval explodes to the time buckets it overlaps, each point maps to
  exactly one bucket, the join is a plain distributed hash join on the
  bucket key, and the original predicate re-applies as a residual filter.
  Bucket granularity trades replication factor (intervals spanning many
  buckets) against join selectivity — size it near the median interval
  length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(ts: Column | str) -> Column:
    """Whole seconds since 1970-01-01 for an NTZ timestamp, computed
    entirely in NTZ space — no LTZ detour, so the result is independent of
    the session timezone (the driver runs a vanilla session; we must not
    assume UTC). Post-epoch timestamps only (``timestampdiff`` truncates
    toward zero)."""
    t = F.col(ts) if isinstance(ts, str) else ts
    anchor = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("SECOND", anchor, t)


def time_bucket(ts: Column | str, bucket_seconds: int) -> Column:
    """Floor an NTZ timestamp to a fixed-width bucket (epoch-aligned)."""
    anchor = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    b = (F.floor(epoch_seconds(ts) / bucket_seconds) * bucket_seconds).cast("long")
    return F.timestamp_add("SECOND", b, anchor)


def resample_gapfill(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    value_col: str,
    bucket_seconds: int,
    agg=None,
) -> DataFrame:
    """Per-group fixed-width resample with dense buckets and forward fill.

    Returns one row per (group, bucket) for EVERY bucket between each
    group's first and last observation: ``n`` (0 on gaps) and
    ``filled_value`` (last non-null aggregate carried forward; null before
    a group's first observation). ``agg`` defaults to an exact decimal sum
    of ``value_col`` (registry float discipline).
    """
    from duck_delta_share_spark.plans.registry import dsum

    agg_expr = agg if agg is not None else dsum(value_col)
    bucket = time_bucket(ts_col, bucket_seconds)
    rolled = (
        df.groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), agg_expr.alias("total_value"))
    )
    step = F.expr(f"interval {bucket_seconds} seconds")
    calendar = (
        rolled.groupBy(*group_cols)
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select(
            *group_cols,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        calendar.join(rolled, [*group_cols, "bucket"], "left")
        .select(
            *group_cols,
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("total_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "win_start",
    end_col: str = "win_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Containment join (start <= ts < end) as a distributed hash join.

    Each interval is replicated to the buckets it overlaps; each point
    joins on its single bucket; the exact predicate re-applies after.
    Result columns: all point columns + all interval columns.
    """
    # bucket COVERAGE only has to be sound, not tight — the exact
    # predicate re-applies below. Using floor(end) unconditionally may
    # replicate an interval into one extra bucket; never misses one.
    lo = F.floor(epoch_seconds(start_col) / bucket_seconds)
    hi = F.floor(epoch_seconds(end_col) / bucket_seconds)
    ints = intervals.withColumn(
        "__bucket", F.explode(F.sequence(lo.cast("long"), hi.cast("long")))
    )
    pts = points.withColumn(
        "__bucket", F.floor(epoch_seconds(ts_col) / bucket_seconds).cast("long")
    )
    return (
        pts.join(ints, "__bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bucket")
    )


def ewma(
    df: "DataFrame",
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    alpha: float,
    bucket_seconds: int = 3600,
) -> "DataFrame":
    """Exponentially-weighted moving average per key over time buckets:
    bucket means first (one hash-agg shuffle, decimal-exact sums), then a
    LINEAR per-key scan ``s_t = (1-α)·s_{t-1} + α·x_t`` (s_{-1} = 0) in
    Arrow batches — the recursive fold no window frame can express and a
    prefix-refold would make O(n²). One extra shuffle keyed on the
    (usually low-cardinality) key set; state is one double per key.

    The fold order is pinned (bucket ascending), so results are bit-exact
    reproducible — the DuckDB oracle replays the identical fold with
    ``list_reduce`` (`plans/timeseries_queries.py`).
    """
    import pandas as pd

    from pyspark.sql import functions as F

    a = float(alpha)
    # NTZ-space bucketing like every sibling helper (time_bucket):
    # unix_timestamp would interpret the NTZ ts in the SESSION timezone,
    # landing bucket boundaries at :30 wall-clock under e.g. +5:30 — the
    # module's "must not assume UTC" invariant and the oracle's
    # date_trunc('hour', ts) both demand timezone-free flooring
    bucket = time_bucket(ts_col, bucket_seconds) if bucket_seconds else F.col(ts_col)
    hourly = (
        df.groupBy(*key_cols, bucket.alias("__b"))
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    out_fields = ", ".join(
        f"`{c}` {hourly.schema[c].dataType.simpleString()}" for c in key_cols
    )
    bucket_type = hourly.schema["__b"].dataType.simpleString()
    schema = f"{out_fields}, bucket {bucket_type}, ewma double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__b")
        acc, out = 0.0, []
        for s, n in zip(pdf["__s"], pdf["__n"]):
            acc = acc * (1.0 - a) + a * (s / n)
            out.append(acc)
        res = pdf[key_cols].copy()
        res["bucket"] = pdf["__b"]
        res["ewma"] = out
        return res

    return hourly.groupBy(*key_cols).applyInPandas(fold, schema)


def twap(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Time-weighted average price/value per (group, bucket) — the
    classic TWAP rollup: each observation is weighted by its HOLDING
    time, i.e. until the next observation in the same bucket, the last
    one until the bucket's end. Irregularly-sampled series aggregate
    correctly (a value held for 59 minutes dominates one held for one
    second — a plain AVG would weight them equally).

    Shape: ONE window pass (lead over (group, bucket) keyed partitions,
    micros-exact integer deltas) + ONE hash agg on the same key — the
    window's shuffle is reused by the agg, so a single exchange total.
    Weighted sums follow the exact-decimal discipline with the FACTOR
    cast to decimal(18,6) before the integer multiply (the product is
    then exact — casting the double product rounds engine-dependently
    past 17 significant digits); the time axis never touches doubles.

    Domain: |value| < 1e12 — the decimal(18,6) factor cast overflows
    past that (ANSI Spark throws, DuckDB errors: loud and symmetric on
    both engines, never a silent wrap). The older decimal(27,6) PRODUCT
    form tolerated larger magnitudes but rounded engine-dependently;
    exactness won (r7 fuzz, 145/1375 buckets differed in the sum)."""
    # NTZ space like every helper above — no LTZ detour, no session-tz
    # dependence (the driver runs a vanilla, possibly non-UTC session)
    anchor = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    tus = F.timestamp_diff(
        "MICROSECOND", anchor, F.col(ts_col).cast("timestamp_ntz")
    )
    bucket = F.floor(tus / F.lit(bucket_seconds * 1_000_000)).cast("long")
    # NULLS FIRST pinned explicitly: Spark's ASC default is NULLS FIRST,
    # DuckDB's is NULLS LAST — a NULL value in the tie-break reorders
    # the lead() chain and silently shifts every dt in the bucket (r7
    # NULL fuzz); the oracle mirrors with `value NULLS FIRST`
    w = Window.partitionBy(*group_cols, "__bucket").orderBy(
        "__tus", F.asc_nulls_first(value_col)
    )
    base = df.select(
        *group_cols,
        F.col(value_col),
        tus.alias("__tus"),
        bucket.alias("__bucket"),
    ).withColumn(
        "__dt",
        F.coalesce(
            F.lead("__tus").over(w),
            (F.col("__bucket") + 1) * F.lit(bucket_seconds * 1_000_000),
        )
        - F.col("__tus"),
    )
    return (
        base.groupBy(*group_cols, "__bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            # Two r7-fuzz lessons baked in: (1) cast the FACTOR to
            # decimal, never the double PRODUCT — value*dt at magnitude
            # 1e11 exceeds double's decimal precision, and Spark
            # (shortest-repr) vs DuckDB (exact binary) round the cast
            # differently (145/1375 fuzz buckets differed in the SUM
            # itself); decimal * integer is exact, so the sums are
            # bit-identical. (2) floor(x*1e6 + 0.5)/1e6, not round(x, 6):
            # Spark's round HALF_UPs the shortest decimal repr while
            # DuckDB rounds the exact binary value — boundary quotients
            # flip differently; the floor form is the same IEEE op
            # sequence on both engines (the cos_e6 pinning precedent).
            (
                F.floor(
                    F.sum(
                        F.col(value_col).cast("decimal(18,6)")
                        * F.col("__dt")
                    ).cast("double")
                    / F.nullif(F.sum("__dt"), F.lit(0))
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("twap"),
        )
        .select(
            *group_cols,
            F.timestamp_add(
                "SECOND",
                (F.col("__bucket") * bucket_seconds).cast("long"),
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            ).alias("bucket_ts"),
            "n_events",
            "twap",
        )
    )
