"""SetTransaction (txn) actions + the exactly-once streaming Delta sink:
log replay, checkpoint persistence, replayed-batch skip, and end-to-end
stream → Delta parity with the batch source."""

from __future__ import annotations

from duck_delta_share_spark.sources.delta_log import (
    checkpoint,
    last_txn_version,
    read_delta,
    snapshot,
    write_delta,
)
from duck_delta_share_spark.streaming.delta_sink import (
    delta_batch_writer,
    stream_to_delta,
)
from tests.conftest import SF_DIR


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "CAST(id * 2 AS BIGINT) AS v")


def test_txn_replay_latest_wins(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark, 0, 5), t, txn=("app_a", 0))
    write_delta(_df(spark, 5, 10), t, txn=("app_a", 1))
    write_delta(_df(spark, 10, 15), t, txn=("app_b", 7))
    s = snapshot(t)
    assert s.transactions == {"app_a": 1, "app_b": 7}
    assert last_txn_version(t, "app_a") == 1
    assert last_txn_version(t, "app_b") == 7
    assert last_txn_version(t, "nobody") == -1
    assert last_txn_version(tmp_path / "missing", "x") == -1


def test_txn_survives_checkpoint_truncation(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark, 0, 5), t, txn=("app", 3))
    write_delta(_df(spark, 5, 10), t, txn=("app", 4))
    v = checkpoint(t)
    # truncate: delete all commit files <= checkpoint version
    for c in (t / "_delta_log").glob("*.json"):
        if int(c.stem) <= v:
            c.unlink()
    assert snapshot(t).transactions == {"app": 4}
    assert read_delta(spark, t).count() == 10


def test_txn_survives_multipart_checkpoint(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark, 0, 20).repartition(4), t, txn=("app", 1))
    v = checkpoint(t, max_actions_per_part=2)
    for c in (t / "_delta_log").glob("*.json"):
        if int(c.stem) <= v:
            c.unlink()
    assert snapshot(t).transactions == {"app": 1}


def test_replayed_batch_skipped(spark, tmp_path):
    t = tmp_path / "t"
    w = delta_batch_writer(t, "job")
    w(_df(spark, 0, 10), 0)
    w(_df(spark, 10, 20), 1)
    # a crash-replay of batch 1 must be a no-op
    w(_df(spark, 10, 20), 1)
    w(_df(spark, 0, 20), 0)
    out = read_delta(spark, t)
    assert out.count() == 20
    assert out.select("id").distinct().count() == 20
    assert last_txn_version(t, "job") == 1
    # a NEW batch still lands
    w(_df(spark, 20, 25), 2)
    assert read_delta(spark, t).count() == 25


def test_stream_to_delta_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.streaming.events import read_events_stream

    t = tmp_path / "evt"
    stream = read_events_stream(spark, SF_DIR).select(
        "event_id", "user_id", "event_type", "value"
    )
    stream_to_delta(stream, t, str(tmp_path / "ckpt"), app_id="evt_job")
    got = read_delta(spark, t)
    want = load_table(spark, SF_DIR, "events")
    assert got.count() == want.count()
    g = got.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    w = want.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    assert tuple(g) == tuple(w)
    # restart on the same checkpoint: nothing new to read, no duplicates
    stream_to_delta(
        read_events_stream(spark, SF_DIR).select(
            "event_id", "user_id", "event_type", "value"
        ),
        t,
        str(tmp_path / "ckpt"),
        app_id="evt_job",
    )
    assert read_delta(spark, t).count() == want.count()
