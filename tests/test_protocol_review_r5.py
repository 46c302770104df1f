"""Regression tests for the round-5 concurrency/protocol-conformance
review of the local Delta log: atomic commit visibility, blind-retry
conflict classes, SetTransaction races, metaData.id preservation,
tombstone deletionTimestamps, checkpoint tombstones + atomic writes, ICT
monotonicity against foreign clamps, and cdc-exclusive change feeds."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from duck_delta_share_spark.sources import delta_log as dl
from duck_delta_share_spark.sources.delta_log import (
    add_check_constraint,
    checkpoint,
    delete_where,
    snapshot,
    version_changes,
    write_delta,
)


def _commit_lines(t: Path, v: int) -> list[dict]:
    p = t / "_delta_log" / f"{v:020d}.json"
    return [json.loads(x) for x in p.read_text().splitlines() if x.strip()]


def _rewrite_commit(t: Path, v: int, lines: list[dict]) -> None:
    p = t / "_delta_log" / f"{v:020d}.json"
    p.write_text("\n".join(json.dumps(a) for a in lines) + "\n")


# ---------------------------------------------------------------------------
# commit atomicity: no tmp residue, full content under the final name
# ---------------------------------------------------------------------------


def test_commit_leaves_no_tmp_and_is_complete(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,)], "id int"), t)
    write_delta(spark.createDataFrame([(2,)], "id int"), t, mode="append")
    log = t / "_delta_log"
    assert not list(log.glob("*.tmp")) and not list(log.glob(".*.tmp"))
    lines = _commit_lines(t, 1)
    assert any("add" in a for a in lines) and any("commitInfo" in a for a in lines)


# ---------------------------------------------------------------------------
# blind append retry must not skip metadata/protocol/txn conflict classes
# ---------------------------------------------------------------------------


def _race(monkeypatch, competitor_actions, operation="ALTER"):
    orig = dl._atomic_commit
    state = {"raced": False}

    def racing(table, version, actions, **kw):
        if not state["raced"]:
            state["raced"] = True
            orig(table, version, competitor_actions, operation=operation)
        return orig(table, version, actions, **kw)

    monkeypatch.setattr(dl, "_atomic_commit", racing)


def test_append_retry_detects_concurrent_metadata(spark, tmp_path, monkeypatch):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,)], "id int"), t)
    snap = snapshot(t)
    _race(
        monkeypatch,
        [
            {
                "metaData": {
                    "id": "whatever",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": snap.schema_string,
                    "partitionColumns": [],
                    "configuration": {"delta.appendOnly": "true"},
                }
            }
        ],
    )
    with pytest.raises(RuntimeError, match="metadata/protocol"):
        write_delta(spark.createDataFrame([(2,)], "id int"), t, mode="append")


def test_append_retry_detects_concurrent_txn_same_app(spark, tmp_path, monkeypatch):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,)], "id int"), t)
    _race(
        monkeypatch,
        [{"txn": {"appId": "sink-A", "version": 7, "lastUpdated": 0}}],
        operation="WRITE",
    )
    with pytest.raises(RuntimeError, match="sink-A"):
        write_delta(
            spark.createDataFrame([(2,)], "id int"),
            t,
            mode="append",
            txn=("sink-A", 7),
        )
    # a DIFFERENT app's txn does not conflict
    _race(
        monkeypatch,
        [{"txn": {"appId": "sink-B", "version": 3, "lastUpdated": 0}}],
        operation="WRITE",
    )
    v = write_delta(
        spark.createDataFrame([(3,)], "id int"), t, mode="append", txn=("sink-A", 8)
    )
    assert snapshot(t).transactions["sink-A"] == 8 and v > 0


# ---------------------------------------------------------------------------
# metaData.id is created once and preserved forever
# ---------------------------------------------------------------------------


def test_metadata_id_preserved_from_foreign_creation(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,)], "id int"), t)
    lines = _commit_lines(t, 0)
    for a in lines:
        if "metaData" in a:
            a["metaData"]["id"] = "foreign-table-id-123"
    _rewrite_commit(t, 0, lines)
    assert snapshot(t).metadata_id == "foreign-table-id-123"
    add_check_constraint(spark, t, "pos", "id >= 0")
    md = next(a["metaData"] for a in _commit_lines(t, 1) if "metaData" in a)
    assert md["id"] == "foreign-table-id-123"
    # and a checkpoint restates the same id
    checkpoint(t)
    assert snapshot(t).metadata_id == "foreign-table-id-123"


# ---------------------------------------------------------------------------
# tombstones: deletionTimestamp stamped; checkpoints retain removes
# ---------------------------------------------------------------------------


def test_removes_carry_deletion_timestamp(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,), (2,)], "id int"), t)
    write_delta(spark.createDataFrame([(3,)], "id int"), t, mode="overwrite")
    removes = [a["remove"] for a in _commit_lines(t, 1) if "remove" in a]
    assert removes and all(r.get("deletionTimestamp", 0) > 0 for r in removes)


def test_checkpoint_retains_tombstones_and_truncates(spark, tmp_path):
    import pyarrow.parquet as pq

    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,), (2,)], "id int"), t)
    write_delta(spark.createDataFrame([(3,)], "id int"), t, mode="overwrite")
    v = checkpoint(t)
    cp = t / "_delta_log" / f"{v:020d}.checkpoint.parquet"
    rows = pq.read_table(cp).to_pylist()
    tombs = [
        r["remove"]
        for r in rows
        if r.get("remove") and r["remove"].get("path") is not None
    ]
    assert tombs, "checkpoint dropped the overwrite's tombstones"
    assert all(tb["deletionTimestamp"] > 0 for tb in tombs)
    # _last_checkpoint size counts ACTIONS, atomically written
    lc = json.loads((t / "_delta_log" / "_last_checkpoint").read_text())
    assert lc["size"] == len(rows)
    # live state unaffected
    assert {r["id"] for r in dl.read_delta(spark, t).collect()} == {3}


# ---------------------------------------------------------------------------
# ICT monotonicity: clamp against the previous IN-COMMIT timestamp
# ---------------------------------------------------------------------------


def test_ict_clamps_against_foreign_in_commit_timestamp(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(1,)], "id int"),
        t,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    future = 99_999_999_999_999  # a foreign writer's clamped ICT, >> wall clock
    lines = _commit_lines(t, 0)
    for a in lines:
        if "commitInfo" in a:
            a["commitInfo"]["inCommitTimestamp"] = future
            a["commitInfo"]["timestamp"] = 500  # stale wall clock
    _rewrite_commit(t, 0, lines)
    write_delta(spark.createDataFrame([(2,)], "id int"), t, mode="append")
    info = next(a["commitInfo"] for a in _commit_lines(t, 1) if "commitInfo" in a)
    assert info["inCommitTimestamp"] > future


# ---------------------------------------------------------------------------
# cdc actions are exclusive for their version
# ---------------------------------------------------------------------------


def test_version_changes_cdc_exclusive(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, v string"), t)
    cdc_dir = t / "_change_data"
    cdc_dir.mkdir()
    pq.write_table(
        pa.table({"id": [1], "v": ["a2"], "_change_type": ["update_postimage"]}),
        cdc_dir / "cdc-0.parquet",
    )
    # a delta-spark-style UPDATE commit: cdc + the add/remove rewrite churn
    (t / "_delta_log" / f"{1:020d}.json").write_text(
        "\n".join(
            json.dumps(a)
            for a in [
                {"commitInfo": {"timestamp": 1700000000000, "operation": "UPDATE"}},
                {
                    "cdc": {
                        "path": "_change_data/cdc-0.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "dataChange": False,
                    }
                },
                {
                    "add": {
                        "path": "rewritten.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                },
                {
                    "remove": {
                        "path": "old.parquet",
                        "dataChange": True,
                        "deletionTimestamp": 1700000000000,
                    }
                },
            ]
        )
        + "\n"
    )
    changes = version_changes(t, 1, 1)
    assert [c["action"] for c in changes] == ["cdf"], (
        "add/remove churn must not double-count a cdc version"
    )
