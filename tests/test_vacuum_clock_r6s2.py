"""Clock-skew lens (r6 session 2): vacuum eligibility must follow the
remove tombstone's deletionTimestamp (the protocol's vacuum clock), not
file mtime alone — CONVERTed/restored tables carry years-old mtimes on
freshly-removed files."""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from duck_delta_share_spark.sources.delta_log import (
    checkpoint,
    read_delta,
    vacuum,
    write_delta,
)


def _age_files(table, hours=400):
    old = time.time() - hours * 3600
    for p in Path(table).rglob("*.parquet"):
        if "_delta_log" not in p.parts:
            os.utime(p, (old, old))


def test_vacuum_honors_recent_tombstone_over_old_mtime(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(i, "a") for i in range(10)],
                                      "id int, v string"), t)
    _age_files(t)  # converted-table posture: data files have old mtimes
    write_delta(
        spark.createDataFrame([(99, "b")], "id int, v string"), t,
        mode="overwrite",
    )  # removes the v0 files with FRESH deletionTimestamps
    out = vacuum(t, retain_hours=168.0)
    assert out["files_removed"] == 0, "freshly-removed files must survive"
    # time travel to v0 still works inside the retention window
    assert read_delta(spark, t, version=0).count() == 10
    assert read_delta(spark, t).count() == 1


def test_vacuum_deletes_when_both_clocks_expired(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, v string"), t)
    _age_files(t)
    write_delta(
        spark.createDataFrame([(2, "b")], "id int, v string"), t,
        mode="overwrite",
    )
    # age the tombstone too: rewrite the overwrite commit's
    # deletionTimestamp to 400h ago
    log = t / "_delta_log"
    cp = log / f"{1:020d}.json"
    old_ms = int((time.time() - 400 * 3600) * 1000)
    lines = []
    for line in cp.read_text().splitlines():
        a = json.loads(line)
        if "remove" in a:
            a["remove"]["deletionTimestamp"] = old_ms
        lines.append(json.dumps(a))
    cp.write_text("\n".join(lines) + "\n")
    out = vacuum(t, retain_hours=168.0)
    # every unreferenced v0 file goes (the writer may emit several parts)
    assert out["files_removed"] >= 1
    assert read_delta(spark, t).count() == 1


def test_vacuum_orphan_without_tombstone_uses_mtime(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, v string"), t)
    orphan = t / "part-orphan-deadbeef.parquet"
    orphan.write_bytes(b"x" * 8)
    old = time.time() - 400 * 3600
    os.utime(orphan, (old, old))
    out = vacuum(t, retain_hours=168.0)
    assert not orphan.exists()
    assert out["files_removed"] == 1
    assert read_delta(spark, t).count() == 1


def test_vacuum_reads_tombstones_from_checkpoints_after_truncation(
    spark, tmp_path
):
    # after checkpoint + log truncation the remove tombstones live ONLY
    # in the checkpoint — vacuum must still see them
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(i, "a") for i in range(6)],
                                      "id int, v string"), t)
    _age_files(t)
    write_delta(
        spark.createDataFrame([(9, "b")], "id int, v string"), t,
        mode="overwrite",
    )
    checkpoint(t)
    log = t / "_delta_log"
    for c in log.glob("*.json"):
        c.unlink()  # truncation: tombstones now only in the checkpoint
    out = vacuum(t, retain_hours=168.0)
    assert out["files_removed"] == 0, (
        "checkpoint-persisted tombstones must protect recent removes"
    )
    assert read_delta(spark, t).count() == 1
