"""Regression tests for the round-5 delta-log/sinks/pushdown self-review
findings: NULL-partition upserts, schema evolution on identity-mapped
tables, Not(EqualNullSafe) hint soundness, legacy-implied features on the
DV protocol upgrade, unknown UPDATE assignment keys, foreign "cdc" action
keys, empty/all-NULL-key merges, clustered-OPTIMIZE name translation, and
inCommitTimestamp enablement at table creation."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from duck_delta_share_spark.sources.delta_log import (
    delete_where,
    enable_column_mapping,
    merge_delta,
    optimize,
    rename_column,
    snapshot,
    update_where,
    version_changes,
    write_delta,
)


def _read(spark, t):
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.dataSource.register(DeltaShareDataSource)
    return spark.read.format("deltashare").option("deltaPath", str(t)).load()


# ---------------------------------------------------------------------------
# sinks: NULL partition values must not lose existing rows
# ---------------------------------------------------------------------------


def test_upsert_partitioned_null_partition_keeps_existing(spark, tmp_path):
    from duck_delta_share_spark import sinks

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, None, "a"), (2, None, "b"), (3, "x", "c")],
        "id int, p string, v string",
    )
    base.write.format("parquet").partitionBy("p").save(path)
    updates = spark.createDataFrame([(2, None, "B")], "id int, p string, v string")
    sinks.upsert_partitioned(
        spark, path, updates, key_cols=["id"], partition_by=["p"]
    )
    got = {(r.id, r.p, r.v) for r in spark.read.parquet(path).collect()}
    # pre-fix: row (1, NULL, 'a') vanished — the == pruning predicate is
    # never true for NULL, so the NULL directory was rewritten without it
    assert got == {(1, None, "a"), (2, None, "B"), (3, "x", "c")}


# ---------------------------------------------------------------------------
# identity-mapped tables: schema evolution must assign mapping metadata
# ---------------------------------------------------------------------------


def test_evolution_on_identity_mapped_table(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, name string"), t)
    enable_column_mapping(t)
    # new column via merge_schema on a table whose physicalNames all equal
    # their logical names (so _snap_column_mapping is None)
    write_delta(
        spark.createDataFrame([(2, "b", 9.5)], "id int, name string, score double"),
        t,
        merge_schema=True,
    )
    snap = snapshot(t)
    fields = {f["name"]: f for f in json.loads(snap.schema_string)["fields"]}
    meta = fields["score"].get("metadata") or {}
    assert str(meta.get("delta.columnMapping.physicalName", "")).startswith("col-")
    assert int(meta.get("delta.columnMapping.id", 0)) > 0
    assert int(snap.configuration.get("delta.columnMapping.maxColumnId", 0)) >= int(
        meta["delta.columnMapping.id"]
    )
    # the column must survive a rename (physicalName is the anchor)
    rename_column(t, "score", "points")
    got = {(r.id, r.points) for r in _read(spark, t).select("id", "points").collect()}
    assert got == {(1, None), (2, 9.5)}


# ---------------------------------------------------------------------------
# pushdown: Not(EqualNullSafe) must emit NO hint
# ---------------------------------------------------------------------------


def test_not_eqnullsafe_hint_is_suppressed():
    from pyspark.sql.datasource import EqualNullSafe, EqualTo, Not

    from duck_delta_share_spark.sources.pushdown import filter_to_hint

    assert filter_to_hint(Not(EqualNullSafe(("c",), 5))) is None
    # the null-rejecting sibling keeps its sound hint
    h = filter_to_hint(Not(EqualTo(("c",), 5)))
    assert h is not None and h["op"] == "not"
    # NOT(col <=> NULL) == IS NOT NULL stays translatable
    h2 = filter_to_hint(Not(EqualNullSafe(("c",), None)))
    assert h2 == {
        "op": "not",
        "children": [{"op": "isNull", "children": [{"column": {"name": "c", "valueType": "string"}}]}],
    } or h2 is not None


# ---------------------------------------------------------------------------
# DV delete on a legacy protocol lists the implied writer features
# ---------------------------------------------------------------------------


def test_dv_delete_lists_legacy_implied_features(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,), (2,), (3,)], "id int"), t)
    # hand-upgrade the log's protocol to legacy wv=4 (changeDataFeed +
    # generatedColumns implied)
    log = t / "_delta_log"
    v0 = log / "00000000000000000000.json"
    lines = v0.read_text().splitlines()
    out = []
    for line in lines:
        a = json.loads(line)
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 4}
        out.append(json.dumps(a))
    v0.write_text("\n".join(out) + "\n")

    delete_where(spark, t, "id = 2")
    proto = snapshot(t).protocol
    wf = set(proto.get("writerFeatures") or ())
    assert {"deletionVectors", "appendOnly", "invariants", "checkConstraints",
            "changeDataFeed", "generatedColumns"} <= wf


# ---------------------------------------------------------------------------
# update_where: unknown assignment keys fail loudly
# ---------------------------------------------------------------------------


def test_update_where_unknown_column_raises(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, 5)], "id int, bal int"), t)
    with pytest.raises(ValueError, match="ballance"):
        update_where(spark, t, "bal > 0", {"ballance": "0"})
    assert snapshot(t).version == 0  # nothing committed


# ---------------------------------------------------------------------------
# version_changes surfaces foreign "cdc" actions
# ---------------------------------------------------------------------------


def test_version_changes_reads_cdc_actions(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, v string"), t)
    # hand-write a delta-spark-style CDC commit: {"cdc": {...}}
    cdc_dir = t / "_change_data"
    cdc_dir.mkdir()
    pq.write_table(
        pa.table({"id": [1], "v": ["a2"], "_change_type": ["update_postimage"]}),
        cdc_dir / "cdc-0.parquet",
    )
    commit = t / "_delta_log" / "00000000000000000001.json"
    commit.write_text(
        json.dumps({"commitInfo": {"timestamp": 1700000000000, "operation": "UPDATE"}})
        + "\n"
        + json.dumps(
            {
                "cdc": {
                    "path": "_change_data/cdc-0.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "dataChange": False,
                }
            }
        )
        + "\n"
    )
    changes = version_changes(t, 1, 1)
    assert [c["action"] for c in changes] == ["cdf"]
    assert changes[0]["url"].endswith("cdc-0.parquet")


# ---------------------------------------------------------------------------
# merge_delta: empty and all-NULL-key updates never rewrite the table
# ---------------------------------------------------------------------------


def test_merge_empty_updates_is_noop(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"), t)
    before = snapshot(t)
    res = merge_delta(
        spark,
        t,
        spark.createDataFrame([], "id int, v string"),
        key_cols=["id"],
    )
    assert res["files_rewritten"] == 0 and res["rows_written"] == 0
    after = snapshot(t)
    assert after.version == before.version  # no commit at all
    assert [f["url"] for f in after.files] == [f["url"] for f in before.files]


def test_merge_all_null_key_appends_without_rewrite(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, v string"), t)
    before_files = [f["url"] for f in snapshot(t).files]
    res = merge_delta(
        spark,
        t,
        spark.createDataFrame([(None, "n")], "id int, v string"),
        key_cols=["id"],
    )
    assert res["files_rewritten"] == 0
    # original file untouched; the NULL-key row simply appended
    after = snapshot(t)
    assert set(before_files) <= {f["url"] for f in after.files}
    got = {(r.id, r.v) for r in _read(spark, t).collect()}
    assert got == {(1, "a"), (None, "n")}


# ---------------------------------------------------------------------------
# clustered OPTIMIZE translates physical clustering names to logical
# ---------------------------------------------------------------------------


def test_optimize_clustered_after_rename(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(i, i % 5) for i in range(50)], "id int, k int"),
        t,
        cluster_by=["k"],
    )
    write_delta(
        spark.createDataFrame([(100 + i, i % 5) for i in range(50)], "id int, k int"),
        t,
        mode="append",
    )
    enable_column_mapping(t)
    rename_column(t, "k", "bucket")  # physical name stays "k"
    res = optimize(spark, t)  # parameterless: re-cluster on declared cols
    assert res["files_after"] <= res["files_before"]
    got = _read(spark, t)
    assert got.count() == 100 and "bucket" in got.columns


# ---------------------------------------------------------------------------
# inCommitTimestamp enabled at CREATE: protocol + commit-0 timestamp
# ---------------------------------------------------------------------------


def test_ict_at_create(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(1,)], "id int"),
        t,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    proto = snapshot(t).protocol
    assert int(proto.get("minWriterVersion", 0)) == 7
    assert "inCommitTimestamp" in set(proto.get("writerFeatures") or ())
    v0 = (t / "_delta_log" / "00000000000000000000.json").read_text()
    infos = [json.loads(l) for l in v0.splitlines() if "commitInfo" in l]
    assert infos and infos[0]["commitInfo"].get("inCommitTimestamp") is not None
