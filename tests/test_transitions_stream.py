"""Streaming transitions twin: pairs emit exactly when their later event
matures under the watermark, late-but-in-watermark inserts pair
correctly, and the emitted pairs aggregate to a subset of the batch
transition matrix on the shared fixture."""

from __future__ import annotations

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _drain_parquet(spark, src, out_dir, ck, watermark="1 hour"):
    from duck_delta_share_spark.streaming.transitions import (
        transitions_with_state,
    )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, event_type string"
        )
        .parquet(str(src))
        .selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type"
        )
    )
    out = transitions_with_state(stream, watermark=watermark)
    q = (
        out.writeStream.foreachBatch(
            lambda b, _: b.write.mode("append").parquet(str(out_dir))
        )
        .outputMode("append")
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    try:
        return {
            (r.user_id, r.prev_type, r.next_type, r.prev_us, r.next_us)
            for r in spark.read.parquet(str(out_dir)).collect()
        }
    except Exception:
        return set()


def test_pairs_emit_on_maturity_and_late_insert_pairs_correctly(
    spark, tmp_path
):
    src = tmp_path / "src"
    src.mkdir()
    out_dir, ck = tmp_path / "out", tmp_path / "ck"
    T = pd.Timestamp

    def write_batch(name, rows):
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type"]
        ).astype({"event_id": "int64", "user_id": "int64"}).to_parquet(
            src / f"{name}.parquet", coerce_timestamps="us"
        )

    us = lambda s: int(T(s).value // 1000)  # noqa: E731

    # b1: three young events -> nothing matures (watermark still behind)
    write_batch(
        "b1",
        [
            (1, T("2024-01-01 12:00:00"), 1, "view"),
            (2, T("2024-01-01 12:10:00"), 1, "click"),
            (3, T("2024-01-01 12:20:00"), 1, "purchase"),
        ],
    )
    got = _drain_parquet(spark, src, out_dir, ck)
    assert got == set()

    # b2: a far-future user advances the watermark past 12:20 -> the
    # timeout fires and both pairs mature; the anchor (purchase) stays
    write_batch("b2", [(50, T("2024-01-01 18:00:00"), 9, "view")])
    got = _drain_parquet(spark, src, out_dir, ck)
    assert got == {
        (1, "view", "click", us("2024-01-01 12:00:00"), us("2024-01-01 12:10:00")),
        (1, "click", "purchase", us("2024-01-01 12:10:00"), us("2024-01-01 12:20:00")),
    }

    # b3: user 1 reappears hours later -> pairs with the kept anchor;
    # plus a late-but-in-watermark event for user 9 BEFORE its young one
    write_batch(
        "b3",
        [
            (4, T("2024-01-01 18:30:00"), 1, "click"),
            (51, T("2024-01-01 17:30:00"), 9, "scroll"),
        ],
    )
    write_batch("b4", [(99, T("2024-01-02 09:00:00"), 7, "view")])
    got = _drain_parquet(spark, src, out_dir, ck)
    assert (
        1, "purchase", "click",
        us("2024-01-01 12:20:00"), us("2024-01-01 18:30:00"),
    ) in got
    # the late 17:30 scroll slots BEFORE the 18:00 view
    assert (
        9, "scroll", "view",
        us("2024-01-01 17:30:00"), us("2024-01-01 18:00:00"),
    ) in got
    assert len(got) == 4


def test_streaming_pairs_are_a_subset_of_the_batch_matrix(spark, tmp_path):
    from duck_delta_share_spark.plans import QUERIES
    from duck_delta_share_spark.streaming.events import read_events_stream
    from duck_delta_share_spark.streaming.transitions import (
        transitions_with_state,
    )

    out = transitions_with_state(
        read_events_stream(spark, SF_DIR), watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_transitions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_fix"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = (
        spark.sql(
            "SELECT prev_type, next_type, COUNT(*) AS cnt FROM t_transitions "
            "GROUP BY prev_type, next_type"
        )
        .collect()
    )
    assert emitted, "no pairs emitted from the fixture stream"
    batch = {
        (r.prev_type, r.next_type): r.cnt
        for r in QUERIES["event_type_transitions"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    for r in emitted:
        key = (r.prev_type, r.next_type)
        assert key in batch, f"streaming emitted a pair the batch lacks: {key}"
        assert r.cnt <= batch[key], (
            f"{key}: streaming count {r.cnt} exceeds batch {batch[key]}"
        )
    # the stream must mature the overwhelming majority of the fixture
    # (only pairs inside the final 1h watermark horizon may be held back)
    total_emitted = sum(r.cnt for r in emitted)
    total_batch = sum(batch.values())
    assert total_emitted >= 0.8 * total_batch
