"""Restart-storm lens (r8): the crash/restart tests cover ONE
stop/start cycle — here the SAME checkpoint is stopped and restarted
between every micro-batch of input (a deploy-loop / flaky-scheduler
pattern), so offset resume, state round-trips (including the sessionize
NaN "no value yet" sentinel), and repeated ownership re-acquisition
(epoch bumping on every cycle) all exercise many times over one feed.
Final outputs must EQUAL the batch anchors exactly — storms may cost
latency, never rows.
"""

from __future__ import annotations

import pandas as pd
import pytest  # noqa: F401


def _write_chunk(dirpath, name, rows):
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).astype(
        {"event_id": "int64", "user_id": "int64", "value": "float64"}
    ).to_parquet(dirpath / f"{name}.parquet", coerce_timestamps="us", index=False)


def _gen_events():
    """Deterministic corpus with boundary ties (exact 30-min gaps), NULL
    values, and same-timestamp collisions, in chronological chunks."""
    import random

    rng = random.Random(23)
    base = pd.Timestamp("2024-03-01")
    rows = []
    for i in range(300):
        ts = base + pd.Timedelta(minutes=10 * rng.randrange(0, 120))
        val = rng.choice([0.5, 1.0, 2.5, None])
        et = rng.choice(["view", "click", "purchase"])
        rows.append((i, ts, rng.randrange(8), et, val))
    rows.sort(key=lambda r: (r[1], r[0]))
    max_ts = rows[-1][1]
    sentinels = [
        (9001, max_ts + pd.Timedelta(days=30), 9998, "view", 1.0),
        (9002, max_ts + pd.Timedelta(days=60), 9999, "view", 1.0),
    ]
    chunks = [rows[k * 50 : (k + 1) * 50] for k in range(6)]
    return chunks, sentinels


def _storm(spark, tmp_path, make_stream, out_dir, ck):
    """Write one chunk, start a FRESH query on the same checkpoint,
    drain, stop — per chunk. Returns nothing; caller reads out_dir."""
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    chunks, sentinels = _gen_events()
    feed = [(f"b{k}", c) for k, c in enumerate(chunks)] + [
        ("s6", [sentinels[0]]),
        ("s7", [sentinels[1]]),
    ]
    for name, chunk in feed:
        _write_chunk(src, name, chunk)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp_ntz, user_id long,"
                " event_type string, value double"
            )
            .parquet(str(src))
            .selectExpr(
                "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
                "event_type", "value",
            )
        )
        q = (
            make_stream(stream)
            .writeStream.foreachBatch(
                lambda b, _: b.write.mode("append").parquet(str(out_dir))
            )
            .outputMode("append")
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)


def _naive(ts):
    try:
        return ts.replace(tzinfo=None)
    except (TypeError, AttributeError):
        return ts


def test_sessionize_storm_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from duck_delta_share_spark.operators.sessionize import sessionize
    from duck_delta_share_spark.streaming.sessions import (
        sessionize_with_state,
    )

    out_dir, ck = tmp_path / "out", tmp_path / "ck"
    _storm(
        spark, tmp_path,
        lambda s: sessionize_with_state(s, gap_seconds=1800, watermark="1 hour"),
        out_dir, ck,
    )
    got = {
        (r.user_id, _naive(r.session_start)): (
            _naive(r.session_end),
            r.n_events,
            None if r.total_value is None else round(float(r.total_value), 4),
        )
        for r in spark.read.parquet(str(out_dir)).collect()
        if r.user_id not in (9998, 9999)
    }
    src = tmp_path / "src"
    batch = (
        spark.read.parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(~F.col("user_id").isin(9998, 9999))
    )
    want = {
        (r.user_id, _naive(r.session_start)): (
            _naive(r.session_end),
            r.n_events,
            None if r.total_value is None else round(float(r.total_value), 4),
        )
        for r in sessionize(batch, gap_seconds=1800).collect()
    }
    assert got == want and len(want) > 0


def test_transitions_storm_matches_batch(spark, tmp_path):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duck_delta_share_spark.streaming.transitions import (
        transitions_with_state,
    )

    out_dir, ck = tmp_path / "out", tmp_path / "ck"
    _storm(
        spark, tmp_path,
        lambda s: transitions_with_state(s, watermark="1 hour"),
        out_dir, ck,
    )
    got = {
        (r.user_id, r.prev_type, r.next_type, r.prev_us, r.next_us)
        for r in spark.read.parquet(str(out_dir)).collect()
        if r.user_id not in (9998, 9999)
    }
    e = (
        spark.read.parquet(str(tmp_path / "src"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(~F.col("user_id").isin(9998, 9999))
        .select(
            "user_id", "event_type", F.unix_micros("ts").alias("us"),
            "event_id",
        )
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    want = {
        (r.user_id, r.event_type, r.nt, r.us, r.nus)
        for r in e.withColumn("nt", F.lead("event_type").over(w))
        .withColumn("nus", F.lead("us").over(w))
        .where(F.col("nt").isNotNull())
        .collect()
    }
    assert got == want and len(want) > 0


def test_rollup_storm_stays_exact_once(spark, tmp_path):
    """Six appended versions, the maintenance stream restarted around
    every one (fresh acquisition + epoch bump each cycle): the final
    rollup must equal a from-scratch recompute of the final table."""
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta
    from duck_delta_share_spark.streaming.incremental import (
        maintain_rollup_stream,
        read_rollup,
    )

    t, roll, ck = tmp_path / "tbl", tmp_path / "roll", tmp_path / "ck"
    for v in range(6):
        write_delta(
            spark.createDataFrame(
                [(f"k{(v * 3 + j) % 4}", float(v + j)) for j in range(3)],
                "k string, v double",
            ),
            t,
            mode="append",
        )
        q = maintain_rollup_stream(spark, t, ["k"], {"total": "v"}, roll, ck)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    got = {
        r["k"]: (r["n"], round(float(r["total"]), 6))
        for r in read_rollup(spark, roll).collect()
    }
    from pyspark.sql import functions as F

    from duck_delta_share_spark.plans.registry import DEC

    want = {
        r["k"]: (r["n"], round(float(r["total"]), 6))
        for r in read_delta(spark, t)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast(DEC)).alias("total"),
        )
        .collect()
    }
    assert got == want and len(want) == 4
