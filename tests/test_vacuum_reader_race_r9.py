"""Vacuum-vs-reader race lens (r9; VERDICT r8 item 5).

Retention FLOORS were already covered (tests/test_vacuum_clock_r6s2.py);
this lens covers the IN-FLIGHT READER path: a scan whose task list is
already pinned (planned) when VACUUM destroys its files. Contract:

- Inside the retention window, vacuum removes nothing a pinned scan
  references — the scan drains to the FULL original snapshot (snapshot
  isolation holds).
- Past retention, a pinned scan whose file was destroyed must fail
  LOUD with an actionable message (deltaShare _read_task wraps the bare
  FileNotFoundError) — NEVER return a silently smaller table.
- A time-travel read planned AFTER the vacuum fails the same way.
- The latest-snapshot read is always unaffected (vacuum never deletes
  referenced files).

The pinned task list is produced exactly as Spark executors would see
it (tests/vacuum_util.pin_tasks) — deterministic, no timing games.
"""

from __future__ import annotations

import pytest

from duck_delta_share_spark.sources.delta_log import (
    read_delta,
    snapshot,
    vacuum,
    write_delta,
)
from duck_delta_share_spark.sources.delta_share import _read_task
from tests.vacuum_util import (
    age_files,
    age_tombstones,
    pin_tasks,
    refresh_current_files,
)


def _drain(tasks):
    rows = 0
    for t in tasks:
        for batch in _read_task(t):
            rows += batch.num_rows
    return rows


def _overwrite_and_expire(spark, t):
    """Make v0's files vacuum-eligible: overwrite (v1 removes them), age
    every data file's mtime, expire v1's tombstones, re-fresh the CURRENT
    snapshot's files so only v0's are eligible."""
    write_delta(
        spark.createDataFrame([(99, "b")], "id int, v string"),
        t,
        mode="overwrite",
    )
    age_files(t)
    age_tombstones(t, [1])
    refresh_current_files(t, snapshot)


def test_pinned_scan_survives_vacuum_within_retention(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(i, "a") for i in range(10)], "id int, v string"),
        t,
    )
    _, tasks = pin_tasks(t)  # reader planned against v0
    write_delta(
        spark.createDataFrame([(99, "b")], "id int, v string"),
        t,
        mode="overwrite",
    )  # v0 files now unreferenced, tombstones fresh
    out = vacuum(t, retain_hours=168.0)
    assert out["files_removed"] == 0
    # snapshot isolation: the pinned scan still drains the FULL v0 rows
    assert _drain(tasks) == 10


def test_pinned_scan_fails_loud_after_retention_expiry(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(i, "a") for i in range(10)], "id int, v string"),
        t,
    )
    _, tasks = pin_tasks(t)
    assert tasks, "need at least one pinned task"
    _overwrite_and_expire(spark, t)
    out = vacuum(t, retain_hours=168.0)
    assert out["files_removed"] >= 1, "v0 files should be reclaimed"
    # the pinned scan must now fail LOUD and actionably — not shrink
    with pytest.raises(RuntimeError, match="VACUUM|no longer exists"):
        _drain(tasks)


def test_time_travel_past_vacuum_fails_loud_not_partial(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(i, "a") for i in range(10)], "id int, v string"),
        t,
    )
    _overwrite_and_expire(spark, t)
    assert vacuum(t, retain_hours=168.0)["files_removed"] >= 1
    # planning still succeeds (the log retains v0); the READ must raise —
    # a partial/empty result here would silently rewrite history
    _, tasks = pin_tasks(t, version=0)
    with pytest.raises(RuntimeError, match="VACUUM|no longer exists"):
        _drain(tasks)
    # the end-to-end Spark path surfaces the same loud failure
    with pytest.raises(Exception, match="no longer exists|VACUUM"):
        read_delta(spark, t, version=0).collect()


def test_latest_read_after_vacuum_is_unaffected(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(i, "a") for i in range(10)], "id int, v string"),
        t,
    )
    _overwrite_and_expire(spark, t)
    vacuum(t, retain_hours=168.0)
    got = read_delta(spark, t).collect()
    assert [(r.id, r.v) for r in got] == [(99, "b")]
