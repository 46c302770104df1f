"""Schema evolution WHILE a stream is mid-batch (r10; the r6 lens only
covers evolution BETWEEN batches).

The mid-batch interleaving: `partitions(start, end)` has already planned
this trigger's file tasks (each pinned to the stream-start schema and the
planning-time file list) and THEN the table evolves — add column, widen
type, rename under column mapping, OPTIMIZE rewrite, vacuum — before the
executors drain `read(partition)`.

Contract proven here:

- the IN-FLIGHT batch is immune: pinned tasks decode with the
  stream-start schema and pre-evolution values, whatever lands in the
  log after planning (adds/widens/renames are invisible to planned
  tasks; OPTIMIZE only tombstones old files, it never deletes them);
- the NEXT `partitions()` range that covers the evolution commit fails
  fast with the restart message (the r6 guard, re-proven from the
  mid-batch state);
- files vacuumed out from under a planned task fail LOUD (the r9
  `_read_task` wrap's RuntimeError with the retention advice) — never a
  silent empty batch.
"""

from __future__ import annotations

import pytest

from duck_delta_share_spark.sources.delta_log import (
    enable_column_mapping,
    optimize,
    rename_column,
    snapshot,
    vacuum,
    write_delta,
)
from duck_delta_share_spark.sources.delta_share import _read_task
from tests.vacuum_util import age_files, age_tombstones, refresh_current_files


def _stream_reader(t, **opts):
    from duck_delta_share_spark.sources.delta_share import (
        DeltaShareStreamReader,
    )
    from duck_delta_share_spark.sources.schema import schema_from_string

    options = {"deltapath": str(t), **{k.lower(): v for k, v in opts.items()}}
    schema = schema_from_string(snapshot(t).schema_string)
    return DeltaShareStreamReader(options, schema)


def _drain(reader, tasks):
    out = []
    for task in tasks:
        for batch in reader.read(task):
            out.append(batch)
    return out


def test_add_column_mid_batch_pinned_tasks_keep_old_schema(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, tag string"), t)
    r = _stream_reader(t, startingVersion="0")
    r.initialOffset()  # pin the stream-start signature (lazy probe)
    tasks = r.partitions({"version": 0}, {"version": 1})
    assert tasks

    # mid-batch: schema evolves (new column) + a file written under it
    write_delta(
        spark.createDataFrame([(2, "b", 9.5)], "id int, tag string, score double"),
        t,
        mode="append",
        merge_schema=True,
    )

    batches = _drain(r, tasks)
    names = {n for b in batches for n in b.schema.names}
    assert names == {"id", "tag"}, f"planned tasks leaked the new column: {names}"
    rows = [
        (i, g)
        for b in batches
        for i, g in zip(b.column("id").to_pylist(), b.column("tag").to_pylist())
    ]
    assert rows == [(1, "a")]
    # the NEXT range covering the evolution commit fails fast
    with pytest.raises(ValueError, match="schema changed at version 1"):
        r.partitions({"version": 1}, {"version": 2})


def test_type_widen_mid_batch_pinned_tasks_keep_narrow_type(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, 7)], "id int, n int"), t)
    r = _stream_reader(t, startingVersion="0")
    r.initialOffset()
    tasks = r.partitions({"version": 0}, {"version": 1})

    # mid-batch: n widens int -> long via an evolved append
    write_delta(
        spark.createDataFrame([(2, 2**40)], "id int, n long"),
        t,
        mode="append",
        merge_schema=True,
    )

    batches = _drain(r, tasks)
    import pyarrow as pa

    for b in batches:
        assert b.schema.field("n").type == pa.int32(), (
            "pinned task silently rebound the widened type"
        )
    assert [v for b in batches for v in b.column("n").to_pylist()] == [7]
    with pytest.raises(ValueError, match="schema changed at version 1"):
        r.partitions({"version": 1}, {"version": 2})


def test_rename_mid_batch_pinned_tasks_keep_old_names(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, tag string"), t)
    enable_column_mapping(t)  # v1
    r = _stream_reader(t, startingVersion="0")
    r.initialOffset()  # binds the pre-rename (mapped) schema
    tasks = r.partitions({"version": 0}, {"version": 2})
    assert tasks

    v = rename_column(t, "tag", "label")  # mid-batch metadata-only rename

    batches = _drain(r, tasks)
    names = {n for b in batches for n in b.schema.names}
    assert names == {"id", "tag"}, f"mid-batch rename leaked into pinned tasks: {names}"
    assert [x for b in batches for x in b.column("tag").to_pylist()] == ["a"]
    with pytest.raises(ValueError, match="schema changed at version"):
        r.partitions({"version": 2}, {"version": v + 1})


def test_optimize_mid_batch_planned_files_still_readable(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, tag string"), t)
    write_delta(
        spark.createDataFrame([(2, "b")], "id int, tag string"), t, mode="append"
    )
    r = _stream_reader(t, startingVersion="0")
    r.initialOffset()
    tasks = r.partitions({"version": 0}, {"version": 2})
    assert len(tasks) >= 2

    optimize(spark, t)  # mid-batch compaction tombstones the planned files

    got = sorted(
        i for b in _drain(r, tasks) for i in b.column("id").to_pylist()
    )
    assert got == [1, 2], "OPTIMIZE must never break an in-flight batch"


def test_vacuum_mid_batch_fails_loud_never_silent_empty(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, tag string"), t)
    r = _stream_reader(t, startingVersion="0")
    r.initialOffset()
    tasks = r.partitions({"version": 0}, {"version": 1})
    assert tasks

    # mid-batch: an overwrite supersedes the planned file (a single-file
    # optimize is a documented no-op and commits nothing), retention
    # expires, vacuum removes the planned physical file
    write_delta(
        spark.createDataFrame([(9, "z")], "id int, tag string"),
        t,
        mode="overwrite",
    )
    age_files(t)
    age_tombstones(t, [snapshot(t).version])
    refresh_current_files(t, snapshot)
    gone = vacuum(t, retain_hours=0.0)
    assert gone["files_removed"] >= 1

    with pytest.raises(RuntimeError, match="deleted after the scan was planned"):
        for task in tasks:
            for _ in _read_task(task):
                pass
