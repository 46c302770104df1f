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
