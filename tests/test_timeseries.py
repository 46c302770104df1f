"""Time-series operators: gap-fill density/correctness and the bucketized
interval join vs the naive cross-product reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.timeseries import (
    interval_join_bucketed,
    resample_gapfill,
    time_bucket,
)
from tests.conftest import SF_DIR


def test_gapfill_buckets_are_dense_and_counts_match(spark):
    e = load_table(spark, SF_DIR, "events")
    out = resample_gapfill(e, "ts", ["event_type"], "value", 3600).cache()

    # dense: per group, bucket count == (max-min)/3600 + 1
    spans = (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            (
                (F.unix_timestamp(F.max("bucket")) - F.unix_timestamp(F.min("bucket")))
                / 3600
                + 1
            ).cast("long").alias("expected"),
        )
        .collect()
    )
    assert spans and all(r.rows == r.expected for r in spans)

    # gap rows exist at hourly granularity on this fixture, with n=0 and a
    # carried-forward value
    gaps = out.filter(F.col("n") == 0)
    assert gaps.count() > 0
    assert gaps.filter(F.col("filled_value").isNull()).count() == 0

    # total event count is preserved by the resample
    assert out.agg(F.sum("n")).first()[0] == e.count()


def test_gapfill_forward_fill_semantics(spark):
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:10:00", 1.0),
            ("a", "2024-01-01 03:20:00", 5.0),  # 2 empty hours between
        ],
        "g string, ts string, value double",
    ).select("g", F.col("ts").cast("timestamp_ntz").alias("ts"), "value")
    out = resample_gapfill(df, "ts", ["g"], "value", 3600).orderBy("bucket").collect()
    assert [r.n for r in out] == [1, 0, 0, 1]
    assert [r.filled_value for r in out] == [1.0, 1.0, 1.0, 5.0]


def test_interval_join_matches_naive_and_avoids_nested_loop(spark):
    e = load_table(spark, SF_DIR, "events")
    win = spark.sql(
        """
        SELECT win_start, win_start + interval 2 hours AS win_end,
               date_format(win_start, 'yyyy-MM-dd') AS win_id
        FROM (SELECT explode(sequence(
                 timestamp_ntz'2024-01-01 06:00:00',
                 timestamp_ntz'2024-01-30 06:00:00',
                 interval 1 day)) AS win_start)
        """
    )
    bucketed = interval_join_bucketed(e, win, "ts", "win_start", "win_end", 3600)
    naive = e.crossJoin(win).filter(
        (F.col("ts") >= F.col("win_start")) & (F.col("ts") < F.col("win_end"))
    )
    got = {(r.event_id, r.win_id) for r in bucketed.collect()}
    want = {(r.event_id, r.win_id) for r in naive.collect()}
    assert got == want and len(got) > 0

    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan

    # interval ending exactly on a bucket boundary must not capture a
    # point at that boundary (end-exclusive)
    pts = spark.createDataFrame(
        [("2024-01-01 08:00:00",)], "ts string"
    ).select(F.col("ts").cast("timestamp_ntz").alias("ts"))
    hit = interval_join_bucketed(pts, win, "ts", "win_start", "win_end", 3600)
    assert hit.count() == 0


def test_time_bucket_is_session_tz_independent(spark):
    df = spark.createDataFrame([("2024-03-15 10:31:07",)], "ts string").select(
        F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        a = df.select(time_bucket("ts", 3600).alias("b")).first().b
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        b = df.select(time_bucket("ts", 3600).alias("b")).first().b
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert a == b and str(a) == "2024-03-15 10:00:00"


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_interval_join_bucketization_sound_random(spark, seed):
    """Randomized adversarial intervals (zero-length, sub-bucket,
    boundary-aligned, multi-bucket) must join identically to the exact
    predicate evaluated in Python — bucket coverage may over-replicate but
    can never MISS a containing interval."""
    import random

    rng = random.Random(seed)
    base = 1_700_000_000  # epoch seconds
    intervals = []
    for i in range(30):
        start = base + rng.randrange(0, 50_000)
        length = rng.choice([0, 1, 7, 3600, 3599, 3601, rng.randrange(0, 20_000)])
        intervals.append((i, start, start + length))
    points = [(j, base + rng.randrange(0, 70_000)) for j in range(200)]
    # adversarial: points exactly on interval starts/ends
    for k, (i, s, e) in enumerate(intervals[:20]):
        points.append((1000 + 2 * k, s))
        points.append((1001 + 2 * k, e))

    expected = {
        (pid, iid)
        for pid, ts in points
        for iid, s, e in intervals
        if s <= ts < e
    }

    ts_col = F.timestamp_seconds(F.col("secs")).cast("timestamp_ntz")
    pts = spark.createDataFrame(points, "pid long, secs long").select(
        "pid", ts_col.alias("ts")
    )
    ivs = spark.createDataFrame(intervals, "iid long, s long, e long").select(
        "iid",
        F.timestamp_seconds(F.col("s")).cast("timestamp_ntz").alias("win_start"),
        F.timestamp_seconds(F.col("e")).cast("timestamp_ntz").alias("win_end"),
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join_bucketed(
            pts, ivs, "ts", "win_start", "win_end", 3600
        ).collect()
    }
    assert got == expected


def test_ewma_linear_fold_matches_reference(spark):
    import pandas as pd

    from duck_delta_share_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("a", f"2024-01-01 0{h}:00:00", float(v))
         for h, v in [(0, 10.0), (1, 20.0), (2, 30.0)]]
        + [("b", "2024-01-01 00:00:00", 5.0)],
        "k string, ts string, value double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = {
        (r.k, str(r.bucket)): r.ewma
        for r in ewma(df, "ts", ["k"], "value", alpha=0.5).collect()
    }
    # s_t = 0.5*s_{t-1} + 0.5*x_t, s_{-1}=0
    assert out[("a", "2024-01-01 00:00:00")] == 5.0
    assert out[("a", "2024-01-01 01:00:00")] == 12.5
    assert out[("a", "2024-01-01 02:00:00")] == 21.25
    assert out[("b", "2024-01-01 00:00:00")] == 2.5


def test_twap_weights_by_holding_time(spark):
    """twap: a value held 59 minutes dominates one held 1 minute — the
    plain AVG would say 50/50; the last observation is held to bucket
    end; buckets and groups are independent."""
    from duck_delta_share_spark.operators.timeseries import twap

    rows = [
        # type a, hour 0: v=100 held 00:00->00:59 (59 min), v=0 held 1 min
        ("a", "2024-01-01 00:00:00", 100.0),
        ("a", "2024-01-01 00:59:00", 0.0),
        # type a, hour 1: single value held the whole hour
        ("a", "2024-01-01 01:30:00", 42.0),
        # type b, hour 0: two equal holdings -> plain mean
        ("b", "2024-01-01 00:00:00", 10.0),
        ("b", "2024-01-01 00:30:00", 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).selectExpr("event_type", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "value")
    out = {
        (r.event_type, str(r.bucket_ts)): (r.n_events, r.twap)
        for r in twap(df, "ts", ["event_type"], "value").collect()
    }
    assert out[("a", "2024-01-01 00:00:00")] == (2, round(100 * 59 / 60, 6))
    assert out[("a", "2024-01-01 01:00:00")] == (1, 42.0)
    assert out[("b", "2024-01-01 00:00:00")] == (2, 15.0)
