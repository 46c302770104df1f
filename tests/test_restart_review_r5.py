"""Regression tests for the round-5 restart/recovery review of the
streaming surface: rewrite-commit duplication under ignoreDeletes,
monotone offsets under a regressed version probe, table-identity checks,
checkpoint-reset survival for the SCD2 / rollup maintenance streams, the
delta sink's skip warning, and the failOnDataLoss recovery escape."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from duck_delta_share_spark.sources.delta_log import (
    delete_where,
    merge_delta,
    read_delta,
    snapshot,
    write_delta,
)


def _register(spark):
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.dataSource.register(DeltaShareDataSource)


def _stream_reader(spark, t, **opts):
    from duck_delta_share_spark.sources.delta_share import (
        DeltaShareStreamReader,
    )
    from duck_delta_share_spark.sources.schema import schema_from_string

    options = {"deltapath": str(t), **{k.lower(): v for k, v in opts.items()}}
    schema = schema_from_string(snapshot(t).schema_string)
    return DeltaShareStreamReader(options, schema)


# ---------------------------------------------------------------------------
# rewrite commits under ignoreDeletes must NOT silently re-deliver rows
# ---------------------------------------------------------------------------


def test_rewrite_version_requires_ignore_changes(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(i,) for i in range(20)], "id int"), t)
    # an UPDATE-style rewrite: remove + dataChange re-add of survivors
    merge_delta(
        spark, t, spark.createDataFrame([(1,)], "id int"), key_cols=["id"]
    )
    r = _stream_reader(spark, t, startingVersion="1", ignoreDeletes="true")
    with pytest.raises(ValueError, match="ignoreChanges"):
        r.partitions({"version": 1}, {"version": 2})
    # ignoreChanges opts into the re-delivery
    r2 = _stream_reader(spark, t, startingVersion="1", ignoreChanges="true")
    tasks = r2.partitions({"version": 1}, {"version": 2})
    assert tasks, "ignoreChanges should stream the rewritten file"


# ---------------------------------------------------------------------------
# monotone offsets when the version probe regresses (unthrottled path)
# ---------------------------------------------------------------------------


def test_latest_offset_never_regresses(spark, tmp_path, monkeypatch):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,)], "id int"), t)
    r = _stream_reader(spark, t, startingVersion="0")
    assert r.initialOffset()["version"] == 0
    r._last_end = 25  # engine already committed offset 25
    monkeypatch.setattr(r, "_current_version", lambda: 21)  # lagging probe
    assert r.latestOffset()["version"] == 25  # clamped, never backward


# ---------------------------------------------------------------------------
# table identity: a recreated table must not be read against old offsets
# ---------------------------------------------------------------------------


def test_table_identity_mismatch_fails_fast(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,)], "id int"), t)
    r = _stream_reader(spark, t, startingVersion="0")
    off = r.initialOffset()
    assert off.get("tableId")  # identity travels in the offset
    # simulate drop-and-recreate: same path, different metaData.id
    v0 = t / "_delta_log" / f"{0:020d}.json"
    lines = [json.loads(x) for x in v0.read_text().splitlines() if x.strip()]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["id"] = "recreated-table-id"
    v0.write_text("\n".join(json.dumps(a) for a in lines) + "\n")
    r2 = _stream_reader(spark, t, startingVersion="0")
    with pytest.raises(ValueError, match="dropped and recreated"):
        r2.partitions(off, {"version": 1})


# ---------------------------------------------------------------------------
# SCD2 + rollup maintenance survive a checkpoint reset (fresh checkpoint,
# same durable state): pending source versions must still be applied
# ---------------------------------------------------------------------------


def test_scd2_survives_checkpoint_reset(spark, tmp_path):
    from duck_delta_share_spark.streaming.scd2 import maintain_scd2_stream

    _register(spark)
    source, dim = tmp_path / "src", tmp_path / "dim"
    base = spark.range(6).selectExpr("id AS k", "id * 10 AS v")
    write_delta(base.repartition(2), source)

    q = maintain_scd2_stream(spark, source, dim, "k", "v", tmp_path / "ck1")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # new source versions AFTER the first run
    merge_delta(spark, source, base.selectExpr("k", "v + 100 AS v"), ["k"])
    # restart with a FRESH checkpoint (the checkpoint-loss recovery path):
    # batch ids renumber from 0 — the old batch-id marker would have
    # silently discarded the pending version forever
    q2 = maintain_scd2_stream(
        spark, source, dim, "k", "v", tmp_path / "ck2", starting_version=0
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    cur = {
        (r.k, r.v)
        for r in read_delta(spark, dim).where("is_current = 1").collect()
    }
    assert cur == {(i, i * 10 + 100) for i in range(6)}


def test_rollup_survives_checkpoint_reset(spark, tmp_path):
    from duck_delta_share_spark.streaming.incremental import (
        maintain_rollup_stream,
        read_rollup,
    )

    _register(spark)
    source, roll = tmp_path / "src", tmp_path / "roll"
    write_delta(
        spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double"),
        source,
    )
    q = maintain_rollup_stream(
        spark, source, ["k"], {"total": "v"}, roll, tmp_path / "ck1"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    write_delta(
        spark.createDataFrame([("a", 5.0)], "k string, v double"),
        source,
        mode="append",
    )
    q2 = maintain_rollup_stream(
        spark, source, ["k"], {"total": "v"}, roll, tmp_path / "ck2",
        starting_version=0,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {
        r["k"]: float(r["total"]) for r in read_rollup(spark, roll).collect()
    }
    assert got == {"a": 6.0, "b": 2.0}
    meta = json.loads((roll / "_meta.json").read_text())
    assert "last_version" in meta  # durable version watermark, not batch id


# ---------------------------------------------------------------------------
# delta sink: skipped batches warn loudly
# ---------------------------------------------------------------------------


def test_sink_skip_warns(spark, tmp_path):
    from duck_delta_share_spark.streaming.delta_sink import delta_batch_writer

    t = tmp_path / "t"
    w = delta_batch_writer(t, "app-x")
    df = spark.createDataFrame([(1,)], "id int")
    w(df, 5)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")  # exact crash replay (== marker): silent
        w(df, 5)
    with pytest.warns(RuntimeWarning, match="numbering restarted"):
        w(df, 2)  # renumbered batches: the checkpoint-reset footgun
    assert read_delta(spark, t).count() == 1


# ---------------------------------------------------------------------------
# failOnDataLoss=false: vacuumed files skip instead of wedging the stream
# ---------------------------------------------------------------------------


def test_fail_on_data_loss_escape(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,)], "id int"), t)
    write_delta(
        spark.createDataFrame([(2,)], "id int"), t, mode="append"
    )
    # physically delete version 1's data file (a vacuumed pending version)
    snap = snapshot(t)
    lost = [f["url"] for f in snap.files][-1]
    Path(lost).unlink()
    r = _stream_reader(spark, t, startingVersion="0")
    with pytest.warns(RuntimeWarning, match="vacuumed"):
        tasks = _stream_reader(
            spark, t, startingVersion="0", failOnDataLoss="false"
        ).partitions({"version": 0}, {"version": 2})
    assert all(Path(task.url).exists() for task in tasks)
