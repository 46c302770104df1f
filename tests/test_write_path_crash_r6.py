"""Write-path crash/cleanup lens (round 6): partial multi-part
checkpoints must never replay silently, and atomic-write temp orphans
from crashed writers age out under vacuum's retention window."""

from __future__ import annotations

import os
import time

import pytest

from duck_delta_share_spark.sources.delta_log import (
    _checkpoint_files,
    checkpoint,
    read_delta,
    snapshot,
    vacuum,
    write_delta,
)


def _make_table(spark, tmp_path, rows=40):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(i, f"v{i}") for i in range(rows)],
                              "id int, v string"),
        t,
    )
    return t


def test_partial_multipart_checkpoint_fails_loud_at_read(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    v = checkpoint(t, max_actions_per_part=2)
    log = t / "_delta_log"
    parts = sorted(log.glob(f"{v:020d}.checkpoint.*.*.parquet"))
    assert len(parts) >= 2
    # the listing saw a complete set; simulate a concurrent retention
    # cleanup deleting one part between the listing and the read
    parts[1].unlink()
    with pytest.raises(ValueError, match="incomplete at read time"):
        _checkpoint_files(log, v)
    # and _list_versions-driven replay (fresh snapshot) falls back to
    # commit replay — still the CORRECT table, never a partial one
    assert snapshot(t).version == v
    assert read_delta(spark, t).count() == 40


def test_snapshot_never_silently_drops_checkpointed_files(spark, tmp_path):
    # end-to-end: truncate the log after checkpointing (the legitimate
    # maintenance), then break the part set — the reader must ERROR, not
    # return a smaller table
    t = _make_table(spark, tmp_path)
    v = checkpoint(t, max_actions_per_part=2)
    log = t / "_delta_log"
    for c in log.glob("*.json"):
        c.unlink()  # log truncation: checkpoint is now the only source
    assert read_delta(spark, t).count() == 40  # intact checkpoint reads
    parts = sorted(log.glob(f"{v:020d}.checkpoint.*.*.parquet"))
    parts[0].unlink()
    with pytest.raises(Exception):  # incomplete set + no commits -> loud
        read_delta(spark, t).count()


def test_checkpoint_files_raises_on_vanished_checkpoint(spark, tmp_path):
    # _list_versions saw a checkpoint; a concurrent cleanup deleted it
    # before the read. Returning [] would make snapshot() skip replaying
    # every commit <= that version — the guard must fail loud instead.
    t = _make_table(spark, tmp_path)
    log = t / "_delta_log"
    with pytest.raises(FileNotFoundError, match="vanished"):
        _checkpoint_files(log, 0)


def test_snapshot_falls_back_past_torn_single_part_checkpoint(spark, tmp_path):
    # a torn parquet under the FINAL checkpoint name (crash of a writer
    # without atomic rename, or bitrot) must not brick the table while
    # the commits still cover the full history
    t = _make_table(spark, tmp_path)
    write_delta(
        spark.createDataFrame([(99, "x")], "id int, v string"), t, mode="append"
    )
    log = t / "_delta_log"
    (log / f"{1:020d}.checkpoint.parquet").write_text("not parquet at all")
    snap = snapshot(t)
    assert snap.version == 1
    assert read_delta(spark, t).count() == 41


def test_snapshot_prefers_older_valid_checkpoint_over_torn_newer(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    checkpoint(t)  # valid checkpoint at v0
    write_delta(
        spark.createDataFrame([(99, "x")], "id int, v string"), t, mode="append"
    )
    log = t / "_delta_log"
    (log / f"{1:020d}.checkpoint.parquet").write_text("torn")
    # even with commit 0 truncated, the older valid checkpoint + commit 1
    # reconstruct the correct table
    (log / f"{0:020d}.json").unlink()
    assert read_delta(spark, t).count() == 41


def test_torn_checkpoint_with_truncated_log_fails_loud(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    checkpoint(t)
    log = t / "_delta_log"
    (log / f"{0:020d}.json").unlink()  # legitimate truncation
    (log / f"{0:020d}.checkpoint.parquet").write_text("torn")
    with pytest.raises(ValueError, match="missing commit"):
        snapshot(t)


def test_unsupported_protocol_in_checkpoint_is_not_retried_as_torn(spark, tmp_path):
    # the torn-checkpoint fallback must not downgrade "this table demands
    # a reader feature we lack" into "missing commits"
    import pyarrow.parquet as pq

    t = _make_table(spark, tmp_path)
    checkpoint(t)
    log = t / "_delta_log"
    cp = log / f"{0:020d}.checkpoint.parquet"
    tbl = pq.read_table(cp)
    rows = tbl.to_pylist()
    for r in rows:
        if r.get("protocol") and r["protocol"].get("minReaderVersion") is not None:
            r["protocol"] = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["lasersharks"],
                "writerFeatures": ["lasersharks"],
            }
    import pyarrow as pa

    pq.write_table(pa.Table.from_pylist(rows, schema=tbl.schema), cp)
    (log / f"{0:020d}.json").unlink()
    from duck_delta_share_spark.sources.delta_log import UnsupportedTableProtocol

    with pytest.raises(UnsupportedTableProtocol, match="lasersharks"):
        snapshot(t)


def test_vacuum_reclaims_aged_staging_dir_keeps_fresh(spark, tmp_path):
    # a writer that crashed mid-_stage_files leaves _staging_<hex> behind;
    # the unreferenced-file sweep skips staging paths to protect live
    # writers, so vacuum must reclaim ABANDONED ones by age
    t = _make_table(spark, tmp_path)
    aged = t / "_staging_deadbeefdead"
    aged.mkdir()
    (aged / "part-00000.parquet").write_bytes(b"x" * 16)
    old = time.time() - 400 * 3600
    os.utime(aged / "part-00000.parquet", (old, old))
    os.utime(aged, (old, old))
    fresh = t / "_staging_cafecafecafe"
    fresh.mkdir()
    (fresh / "part-00000.parquet").write_bytes(b"y" * 16)
    out = vacuum(t, retain_hours=168.0)
    assert not aged.exists(), "abandoned staging dir must be reclaimed"
    assert fresh.exists(), "an in-flight writer's staging dir must survive"
    assert out["files_removed"] >= 1
    assert read_delta(spark, t).count() == 40


def test_conflict_check_truncation_surfaces_retryable_error(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_log import (
        ConcurrentWriteError,
        _commit_with_conflict_check,
    )

    t = _make_table(spark, tmp_path)
    # competing writers won versions 1 and 2; a maintenance job truncates
    # commit 1 WHILE our conflict check replays it — the re-replay after
    # the next version race must surface the standard retryable conflict,
    # not a raw FileNotFoundError
    for i in (1, 2):
        write_delta(
            spark.createDataFrame([(100 + i, "a")], "id int, v string"),
            t,
            mode="append",
        )
    log = t / "_delta_log"
    seen = {"n": 0}

    def truncating_add_check(add):
        if seen["n"] == 0:
            (log / f"{1:020d}.json").unlink()  # concurrent truncation
        seen["n"] += 1
        return False

    with pytest.raises(ConcurrentWriteError, match="truncated under the conflict"):
        _commit_with_conflict_check(
            t,
            read_version=0,
            actions=[],
            operation="test",
            removed_paths=set(),
            add_conflicts=truncating_add_check,
        )


def test_stale_writer_cannot_recreate_truncated_version(spark, tmp_path):
    # os.link only detects collisions on versions whose json still
    # exists: after checkpoint + truncation a stale writer could
    # RECREATE a folded version and fork history — the guard must refuse
    from duck_delta_share_spark.sources.delta_log import (
        ConcurrentWriteError,
        _atomic_commit,
    )

    t = _make_table(spark, tmp_path)
    write_delta(
        spark.createDataFrame([(1, "a")], "id int, v string"), t, mode="append"
    )
    checkpoint(t)  # folds versions <= 1
    log = t / "_delta_log"
    for c in log.glob("*.json"):
        c.unlink()  # legitimate truncation
    with pytest.raises(ConcurrentWriteError, match="below the latest checkpoint"):
        _atomic_commit(t, 1, [{"add": {"path": "rogue.parquet"}}])
    assert not (log / f"{1:020d}.json").exists(), "rogue commit must not land"
    # a CURRENT writer (fresh snapshot) still appends fine
    write_delta(
        spark.createDataFrame([(2, "b")], "id int, v string"), t, mode="append"
    )
    assert read_delta(spark, t).count() == 42


def test_vacuum_removes_aged_write_temps_keeps_fresh(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    log = t / "_delta_log"
    aged = log / ".00000000000000000099.json.deadbeef.tmp"
    aged.write_text("{}")
    old = time.time() - 400 * 3600
    os.utime(aged, (old, old))
    fresh = log / "00000000000000000099.checkpoint.parquet.tmp"
    fresh.write_text("x")
    out = vacuum(t, retain_hours=168.0)
    assert not aged.exists(), "aged orphan tmp must be reclaimed"
    assert fresh.exists(), "a live writer's fresh tmp must survive"
    assert out["files_removed"] >= 1
    # table reads unaffected
    assert read_delta(spark, t).count() == 40
