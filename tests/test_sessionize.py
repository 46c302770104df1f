"""Sessionization: batch operator vs both streaming implementations.

Streaming append-mode sessions only emit once the watermark passes their
close, so the streaming result is a *prefix* of the batch sessions — every
emitted session must match a batch session exactly, and at least the
clearly-closed ones must have emitted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.sessionize import sessionize
from duck_delta_share_spark.streaming.events import read_events_stream
from duck_delta_share_spark.streaming.sessions import (
    session_windows,
    sessionize_with_state,
)
from tests.conftest import SF_DIR


def _batch_sessions(spark):
    e = load_table(spark, SF_DIR, "events")
    rows = sessionize(e, gap_seconds=1800).collect()
    return {
        (r.user_id, _naive(r.session_start)): (
            _naive(r.session_end),
            r.n_events,
            round(r.total_value, 4),
        )
        for r in rows
    }


def _naive(ts):
    try:
        return ts.replace(tzinfo=None)
    except (TypeError, AttributeError):
        return ts


def _drain(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _check_emitted(spark, name, batch):
    got = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(got) > 0, "no sessions emitted"
    for r in got:
        key = (r.user_id, _naive(r.session_start))
        assert key in batch, f"streaming session {key} not in batch result"
        end, n, total = batch[key]
        assert _naive(r.session_end) == end
        assert r.n_events == n
        assert round(r.total_value, 4) == total


def test_session_window_streaming_matches_batch(spark, tmp_path):
    batch = _batch_sessions(spark)
    stream = session_windows(
        read_events_stream(spark, SF_DIR), gap="30 minutes", watermark="1 hour"
    )
    _drain(stream, tmp_path, "t_sess_native")
    _check_emitted(spark, "t_sess_native", batch)


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    batch = _batch_sessions(spark)
    stream = sessionize_with_state(
        read_events_stream(spark, SF_DIR), gap_seconds=1800, watermark="1 hour"
    )
    _drain(stream, tmp_path, "t_sess_state")
    _check_emitted(spark, "t_sess_state", batch)


def test_stateful_sessionize_late_event_does_not_regress(spark, tmp_path):
    """A late-but-within-watermark cross-batch event must MIN/MAX-extend
    the open session, never regress its bounds (self-review r5): user 1
    has events at 12:00, then a late 11:30 plus 12:25 in the next batch —
    one session [11:30, 12:25] x3, not a split with session_end <
    session_start."""
    import pandas as pd

    from duck_delta_share_spark.streaming.sessions import sessionize_with_state

    src = tmp_path / "late_src"
    src.mkdir()

    def write_batch(name, rows):
        pd.DataFrame(rows, columns=["user_id", "ts", "value"]).astype(
            {"user_id": "int64", "value": "float64"}
        ).to_parquet(src / f"{name}.parquet", coerce_timestamps="us")

    out_dir = tmp_path / "late_out"

    def drain(name):
        stream = (
            spark.readStream.schema("user_id long, ts timestamp_ntz, value double")
            .parquet(str(src))
            .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
        )
        out = sessionize_with_state(stream, gap_seconds=1800, watermark="2 hours")
        q = (
            out.writeStream.foreachBatch(
                lambda b, _: b.write.mode("append").parquet(str(out_dir))
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_late"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        try:
            return spark.read.parquet(str(out_dir)).collect()
        except Exception:
            return []

    T = pd.Timestamp
    write_batch("b1", [(1, T("2024-01-01 12:00:00"), 1.0)])
    drain("late_s1")
    write_batch(
        "b2",
        [(1, T("2024-01-01 11:30:00"), 1.0), (1, T("2024-01-01 12:25:00"), 1.0)],
    )
    drain("late_s2")
    # two pushes of a far-future user advance the watermark past the gap
    # (batch N's events raise the watermark used by batch N+1), firing the
    # open session's event-time timeout
    write_batch("b3", [(2, T("2024-01-01 16:00:00"), 0.0)])
    drain("late_s3")
    write_batch("b4", [(2, T("2024-01-01 17:00:00"), 0.0)])
    emitted = drain("late_s4")

    u1 = [r for r in emitted if r.user_id == 1]
    assert len(u1) == 1, f"expected one merged session, got {u1}"
    s = u1[0]
    assert s.session_start.replace(tzinfo=None) == T("2024-01-01 11:30:00")
    assert s.session_end.replace(tzinfo=None) == T("2024-01-01 12:25:00")
    assert s.n_events == 3
    for r in emitted:
        assert r.session_end >= r.session_start


def test_subsecond_gap_boundary_batch_equals_stateful_twin(spark, tmp_path):
    """r9 (ADVICE r8): the batch operator now measures gaps in exact
    MICROSECONDS like the stateful twin — pin the sub-second boundary on
    both implementations. Grid: an event at exactly last+gap MERGES
    (strict >), at last+gap+0.5s and at last+gap+1µs SPLITS — cases the
    old second-truncated batch gap silently merged."""
    import pandas as pd

    T = pd.Timestamp
    rows = [
        # u1: whole-second base; +gap exactly -> merge; +gap+0.5s -> split
        (1, T("2024-01-01 12:00:00"), 1.0),
        (1, T("2024-01-01 12:30:00"), 1.0),
        (1, T("2024-01-01 13:00:00.500"), 1.0),
        # u2: sub-second base; +gap exactly (sub-second ts both) -> merge
        (2, T("2024-01-01 12:00:00.250"), 1.0),
        (2, T("2024-01-01 12:30:00.250"), 1.0),
        # u3: one MICROSECOND over the gap -> split
        (3, T("2024-01-01 12:00:00"), 1.0),
        (3, T("2024-01-01 12:30:00.000001"), 1.0),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])

    batch_df = spark.createDataFrame(pdf).withColumn(
        "event_id", F.monotonically_increasing_id()
    )
    got = {
        (r.user_id, _naive(r.session_start)): (_naive(r.session_end), r.n_events)
        for r in sessionize(batch_df, gap_seconds=1800).collect()
    }
    want = {
        (1, T("2024-01-01 12:00:00")): (T("2024-01-01 12:30:00"), 2),
        (1, T("2024-01-01 13:00:00.500")): (T("2024-01-01 13:00:00.500"), 1),
        (2, T("2024-01-01 12:00:00.250")): (T("2024-01-01 12:30:00.250"), 2),
        (3, T("2024-01-01 12:00:00")): (T("2024-01-01 12:00:00"), 1),
        (3, T("2024-01-01 12:30:00.000001")): (T("2024-01-01 12:30:00.000001"), 1),
    }
    assert got == want

    # stateful twin on the same sub-second grid: chunked feed + two
    # far-future sentinel pushes flush the timeouts; emitted sessions
    # must EQUAL the batch anchor (minus the sentinels)
    src = tmp_path / "subsec_src"
    src.mkdir()
    out_dir = tmp_path / "subsec_out"

    def write_batch(name, rs):
        pd.DataFrame(rs, columns=["user_id", "ts", "value"]).astype(
            {"user_id": "int64", "value": "float64"}
        ).to_parquet(src / f"{name}.parquet", coerce_timestamps="us")

    def drain(ck):
        stream = (
            spark.readStream.schema("user_id long, ts timestamp_ntz, value double")
            .parquet(str(src))
            .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
        )
        out = sessionize_with_state(stream, gap_seconds=1800, watermark="1 hour")
        q = (
            out.writeStream.foreachBatch(
                lambda b, _: b.write.mode("append").parquet(str(out_dir))
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_subsec"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    write_batch("b1", rows)
    drain("s1")
    write_batch("b2", [(99, T("2024-01-02 12:00:00"), 0.0)])
    drain("s2")
    write_batch("b3", [(99, T("2024-01-03 12:00:00"), 0.0)])
    drain("s3")
    emitted = {
        (r.user_id, _naive(r.session_start)): (_naive(r.session_end), r.n_events)
        for r in spark.read.parquet(str(out_dir)).collect()
        if r.user_id != 99
    }
    assert emitted == want
