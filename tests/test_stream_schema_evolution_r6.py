"""Schema evolution × streaming (VERDICT r5 #2b): a metaData change
BETWEEN a stream's offsets must fail fast — the Python DataSource API
binds the schema once at stream start, so silently continuing would read
new files with the old schema (added columns dropped, renamed/retyped
columns misread, repartitioned rows split). A REPLAY of old history whose
schema was a pure subset of the bound one stays readable (missing columns
are null, exactly like the batch reader)."""

from __future__ import annotations

import pytest

from duck_delta_share_spark.sources.delta_log import (
    enable_column_mapping,
    rename_column,
    snapshot,
    write_delta,
)


def _stream_reader(spark, t, **opts):
    from duck_delta_share_spark.sources.delta_share import (
        DeltaShareStreamReader,
    )
    from duck_delta_share_spark.sources.schema import schema_from_string

    options = {"deltapath": str(t), **{k.lower(): v for k, v in opts.items()}}
    schema = schema_from_string(snapshot(t).schema_string)
    return DeltaShareStreamReader(options, schema)


def test_column_added_mid_stream_fails_fast(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, tag string"), t)
    r = _stream_reader(spark, t, startingVersion="0")
    assert r.initialOffset()["version"] == 0
    # first batch: the pre-change history streams fine
    assert r.partitions({"version": 0}, {"version": 1})
    # v1: schema evolves (new column) + new file written under it
    write_delta(
        spark.createDataFrame([(2, "b", 9.5)], "id int, tag string, score double"),
        t, mode="append", merge_schema=True,
    )
    with pytest.raises(ValueError, match="schema changed at version 1"):
        r.partitions({"version": 1}, {"version": 2})


def test_column_renamed_mid_stream_fails_fast(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, tag string"), t)
    enable_column_mapping(t)  # v1: RENAME needs name-mode mapping
    r = _stream_reader(spark, t, startingVersion="0")
    r.initialOffset()  # stream starts HERE: signature binds pre-rename
    v = rename_column(t, "tag", "label")  # v2: metadata-only rename
    with pytest.raises(ValueError, match="schema changed at version"):
        r.partitions({"version": 0}, {"version": v + 1})


def test_replay_across_old_additive_schema_is_allowed(spark, tmp_path):
    # history: v0 writes (id), v1 evolves to (id, score) — a NEW stream
    # binds the CURRENT schema and replays from version 0; the old
    # metaData (a pure subset) must not trip the guard
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,)], "id int"), t)
    write_delta(
        spark.createDataFrame([(2, 1.5)], "id int, score double"),
        t, mode="append", merge_schema=True,
    )
    r = _stream_reader(spark, t, startingVersion="0")
    tasks = r.partitions({"version": 0}, {"version": 2})
    assert len(tasks) >= 2  # both versions' files stream, guard silent


def test_new_stream_replays_across_old_rename_without_looping(spark, tmp_path):
    """The unrecoverable-loop case from the r6 self-review: history with a
    metadata-only rename (v0 write, v1 mapping upgrade, v2 rename, v3
    append) streamed FROM SCRATCH must bind the current schema and replay
    the whole range — the v0/v1 metaData match the bound schema through
    mapping ids / physicalName, so the guard stays silent. A guard that
    raised here would brick startingVersion=0 forever (each restart
    rebinds the same schema and replays the same history)."""
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, tag string"), t)
    enable_column_mapping(t)                          # v1
    v = rename_column(t, "tag", "label")              # v2
    write_delta(
        spark.createDataFrame([(2, "b")], "id int, label string"),
        t, mode="append",
    )                                                 # v3
    r = _stream_reader(spark, t, startingVersion="0")
    tasks = r.partitions({"version": 0}, {"version": v + 2})
    assert len(tasks) >= 2  # v0 and v3 files both stream


def test_unchanged_metadata_commits_do_not_trip_the_guard(spark, tmp_path):
    # overwrite mode rewrites metaData with an IDENTICAL schema — that is
    # not a schema change and the stream (ignoreChanges) continues
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, tag string"), t)
    r = _stream_reader(spark, t, startingVersion="0", ignoreChanges="true")
    assert r.partitions({"version": 0}, {"version": 1})
    write_delta(
        spark.createDataFrame([(2, "b")], "id int, tag string"),
        t, mode="overwrite",
    )
    assert r.partitions({"version": 1}, {"version": 2})
