"""ADVICE-r6 regression tests: the stale-writer guard must stay
retryable when the colliding commit json still exists (checkpoint
WITHOUT truncation), vacuum's staging/tmp sweeps must floor their age
threshold at 24h independent of the data-file retention, and the
streaming transitions operator's bare anchors expire under an opt-in
idle TTL (bounding TOTAL state by active users)."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from duck_delta_share_spark.sources.delta_log import (
    ConcurrentWriteError,
    _atomic_commit,
    checkpoint,
    read_delta,
    vacuum,
    write_delta,
)


def _make_table(spark, tmp_path, rows=40):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(rows)], "id int, v string"
        ),
        t,
    )
    return t


def test_commit_at_checkpoint_version_with_json_stays_retryable(
    spark, tmp_path
):
    # checkpoint WITHOUT truncation: the commit jsons are all still in
    # place. A writer racing to the checkpointed latest version is an
    # ORDINARY collision — it must surface the FileExistsError the
    # blind bump-and-retry loop in write_delta catches, not the hard
    # ConcurrentWriteError reserved for truly-truncated (stale) writers.
    t = _make_table(spark, tmp_path)
    write_delta(
        spark.createDataFrame([(1, "a")], "id int, v string"), t, mode="append"
    )
    checkpoint(t)  # folds <= 1; jsons 0 and 1 remain on disk
    log = t / "_delta_log"
    assert (log / f"{1:020d}.json").exists()
    before = (log / f"{1:020d}.json").read_bytes()
    with pytest.raises(FileExistsError):
        _atomic_commit(t, 1, [{"add": {"path": "rogue.parquet"}}])
    # the existing commit must be untouched (the guard raises WITHOUT
    # linking — never create names at/below a checkpoint)
    assert (log / f"{1:020d}.json").read_bytes() == before
    # the truncated case still fails hard (original guard semantics)
    (log / f"{1:020d}.json").unlink()
    with pytest.raises(ConcurrentWriteError, match="below the latest checkpoint"):
        _atomic_commit(t, 1, [{"add": {"path": "rogue.parquet"}}])


def test_append_survives_race_with_fresh_checkpoint_end_to_end(
    spark, tmp_path, monkeypatch
):
    # liveness end-to-end: an append whose snapshot-derived version is
    # immediately checkpointed by a concurrent maintenance job (jsons
    # retained) must bump-and-retry to the next version, not fail hard.
    import duck_delta_share_spark.sources.delta_log as dl

    t = _make_table(spark, tmp_path)
    real = dl._atomic_commit
    fired = {"n": 0}

    def racing(table, version, actions, **kw):
        if fired["n"] == 0:
            fired["n"] += 1
            # concurrent writer wins THIS version and checkpoints it
            real(
                table,
                version,
                [{"add": {
                    "path": "winner.parquet", "partitionValues": {},
                    "size": 1, "modificationTime": 0, "dataChange": True,
                }}],
            )
            checkpoint(table)
        return real(table, version, actions, **kw)

    monkeypatch.setattr(dl, "_atomic_commit", racing)
    v = write_delta(
        spark.createDataFrame([(7, "z")], "id int, v string"), t, mode="append"
    )
    cps = sorted(
        int(p.name.split(".")[0]) for p in (t / "_delta_log").glob(
            "*.checkpoint*.parquet"
        )
    )
    assert cps and v > cps[-1], "retry must land ABOVE the fresh checkpoint"


def test_vacuum_zero_retention_spares_fresh_staging_and_tmps(spark, tmp_path):
    # vacuum(table, 0): the DATA-file cutoff honors the caller, but the
    # staging-dir / log-tmp sweeps floor their threshold at 24h — an
    # ACTIVE writer's staging dir (seconds old) must never be reaped by
    # an aggressive retention setting.
    t = _make_table(spark, tmp_path)
    live = t / "_staging_cafecafecafe"
    live.mkdir()
    (live / "part-00000.parquet").write_bytes(b"y" * 16)
    log = t / "_delta_log"
    live_tmp = log / ".00000000000000000099.json.cafecafe.tmp"
    live_tmp.write_text("{}")
    aged = t / "_staging_deadbeefdead"
    aged.mkdir()
    (aged / "part-00000.parquet").write_bytes(b"x" * 16)
    old = time.time() - 48 * 3600  # 2 days: past the 24h floor
    os.utime(aged / "part-00000.parquet", (old, old))
    os.utime(aged, (old, old))
    aged_tmp = log / ".00000000000000000098.json.deadbeef.tmp"
    aged_tmp.write_text("{}")
    os.utime(aged_tmp, (old, old))
    vacuum(t, retain_hours=0.0)
    assert live.exists(), "active writer's staging dir reaped at retention 0"
    assert live_tmp.exists(), "active writer's log tmp reaped at retention 0"
    assert not aged.exists(), "2-day-old staging dir must still age out"
    assert not aged_tmp.exists(), "2-day-old log tmp must still age out"
    assert read_delta(spark, t).count() == 40


def _drain_transitions(spark, src, out_dir, ck, **kw):
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
    out = transitions_with_state(stream, watermark="1 hour", **kw)
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
            (r.user_id, r.prev_type, r.next_type)
            for r in spark.read.parquet(str(out_dir)).collect()
        }
    except Exception:
        return set()


def test_anchor_ttl_expires_idle_state_and_drops_gap_pair(spark, tmp_path):
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

    # b1: user 1 has a pair-in-waiting; user 2 a bare anchor
    write_batch(
        "b1",
        [
            (1, T("2024-01-01 12:00:00"), 1, "view"),
            (2, T("2024-01-01 12:10:00"), 1, "click"),
            (3, T("2024-01-01 12:05:00"), 2, "view"),
        ],
    )
    # b2: far-future event pushes the watermark hours past both TTLs
    write_batch("b2", [(50, T("2024-01-01 18:00:00"), 9, "view")])
    got = _drain_transitions(
        spark, src, out_dir, ck, anchor_ttl_s=3600
    )
    assert got == {(1, "view", "click")}

    # b3: both users return AFTER the 1h TTL — their expired anchors
    # must NOT pair across the gap (the documented trade)
    write_batch(
        "b3",
        [
            (4, T("2024-01-01 17:30:00"), 1, "click"),
            (5, T("2024-01-01 17:15:00"), 2, "scroll"),
        ],
    )
    write_batch("b4", [(99, T("2024-01-02 09:00:00"), 7, "view")])
    got = _drain_transitions(
        spark, src, out_dir, ck, anchor_ttl_s=3600
    )
    assert got == {(1, "view", "click")}, (
        "an anchor past its TTL paired across the silence gap"
    )


def test_no_ttl_keeps_lossless_anchor_behavior(spark, tmp_path):
    # default (anchor_ttl_s=None): the anchor persists across any gap —
    # the pre-ADVICE behavior is unchanged
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

    write_batch("b1", [(1, T("2024-01-01 12:00:00"), 1, "view")])
    write_batch("b2", [(50, T("2024-01-01 18:00:00"), 9, "view")])
    write_batch("b3", [(4, T("2024-01-01 17:30:00"), 1, "click")])
    write_batch("b4", [(99, T("2024-01-02 09:00:00"), 7, "view")])
    got = _drain_transitions(spark, src, out_dir, ck)
    assert (1, "view", "click") in got


def test_ttl_gap_rule_is_batch_boundary_independent(spark, tmp_path):
    # the return event arrives in the SAME batch that advances the
    # watermark past the anchor's TTL: the pair-level gap rule must drop
    # the over-TTL pair anyway (an event-level drop would emit here and
    # drop when the return lands one trigger later — replay with
    # different batch packing would change the output; r7 self-review)
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

    write_batch("b1", [(1, T("2024-01-01 12:00:00"), 1, "view")])
    # ONE batch carries the watermark-advancing traffic AND user 1's
    # return 5.5h after the anchor (TTL is 1h), plus an in-TTL pair for
    # user 2 as the control
    write_batch(
        "b2",
        [
            (2, T("2024-01-01 17:30:00"), 1, "click"),
            (3, T("2024-01-01 17:00:00"), 2, "view"),
            (4, T("2024-01-01 17:20:00"), 2, "click"),
            (50, T("2024-01-01 19:00:00"), 9, "view"),
        ],
    )
    write_batch("b3", [(99, T("2024-01-02 09:00:00"), 7, "view")])
    got = _drain_transitions(
        spark, src, out_dir, ck, anchor_ttl_s=3600
    )
    assert (1, "view", "click") not in got, (
        "an over-TTL pair must be dropped even when the return event "
        "arrives in the same batch as the watermark advance"
    )
    assert (2, "view", "click") in got, "in-TTL pairs must still emit"
