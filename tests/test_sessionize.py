"""Sessionization: batch operator vs both streaming implementations.

Streaming append-mode sessions only emit once the watermark passes their
close, so the streaming result is a *prefix* of the batch sessions — every
emitted session must match a batch session exactly, and at least the
clearly-closed ones must have emitted.
"""

from __future__ import annotations

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
