"""Column-mapping reads for local Delta (minReaderVersion 2 / reader
feature columnMapping): physical parquet names -> logical schema names,
partition re-attachment from physical-keyed partitionValues, pruning with
logical predicates, and the read-only write guard."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duck_delta_share_spark.sources.delta_log import (
    delete_where,
    merge_delta,
    read_delta,
    snapshot,
)


def _mapped_table(tmp_path, partitioned: bool = False):
    """Hand-build a column-mapping Delta table the way delta-spark writes
    one: parquet columns named col-<uuid>, schemaString carrying the
    logical names + delta.columnMapping metadata, physical-keyed
    partitionValues."""
    t = tmp_path / "mapped"
    log = t / "_delta_log"
    log.mkdir(parents=True)

    fields = [
        {
            "name": "id",
            "type": "long",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": "col-aaa111",
            },
        },
        {
            "name": "name",
            "type": "string",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": "col-bbb222",
            },
        },
        {
            "name": "region",
            "type": "string",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 3,
                "delta.columnMapping.physicalName": "col-ccc333",
            },
        },
    ]
    schema_string = json.dumps({"type": "struct", "fields": fields})

    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "mapped-test",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": ["region"] if partitioned else [],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "3",
                },
            }
        },
    ]

    def write_file(name, ids, names, region=None):
        cols = {"col-aaa111": ids, "col-bbb222": names}
        if not partitioned:
            cols["col-ccc333"] = [region or "eu"] * len(ids)
        pq.write_table(pa.table(cols), t / name)
        add = {
            "path": name,
            "partitionValues": {"col-ccc333": region} if partitioned else {},
            "size": (t / name).stat().st_size,
            "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps(
                {
                    "numRecords": len(ids),
                    "minValues": {"col-aaa111": min(ids)},
                    "maxValues": {"col-aaa111": max(ids)},
                }
            ),
        }
        actions.append({"add": add})

    write_file("part-0.parquet", [1, 2], ["a", "b"], region="eu")
    write_file("part-1.parquet", [10, 20], ["x", "y"], region="us")
    (log / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )
    return t


def test_mapped_read_logical_names(spark, tmp_path):
    t = _mapped_table(tmp_path)
    df = read_delta(spark, t)
    assert set(df.columns) == {"id", "name", "region"}
    rows = sorted((r.id, r.name, r.region) for r in df.collect())
    assert rows == [(1, "a", "eu"), (2, "b", "eu"), (10, "x", "us"), (20, "y", "us")]


def test_mapped_predicate_and_stats_pruning(spark, tmp_path):
    t = _mapped_table(tmp_path)
    got = sorted(
        r.name for r in read_delta(spark, t).filter("id >= 10").collect()
    )
    assert got == ["x", "y"]


def test_mapped_partition_reattach_and_pruning(spark, tmp_path):
    t = _mapped_table(tmp_path, partitioned=True)
    df = read_delta(spark, t)
    rows = sorted((r.id, r.region) for r in df.collect())
    assert rows == [(1, "eu"), (2, "eu"), (10, "us"), (20, "us")]
    us = sorted(r.id for r in df.filter("region = 'us'").collect())
    assert us == [10, 20]


def test_mapped_v3_reader_feature_accepted(spark, tmp_path):
    t = _mapped_table(tmp_path)
    commit = (t / "_delta_log" / f"{0:020d}.json").read_text().splitlines()
    first = json.loads(commit[0])
    first["protocol"] = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["columnMapping"],
        "writerFeatures": ["columnMapping"],
    }
    (t / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join([json.dumps(first)] + commit[1:]) + "\n"
    )
    assert read_delta(spark, t).count() == 4


def test_checkpoint_preserves_mapped_protocol(spark, tmp_path):
    """checkpoint() on a column-mapping table must persist the REPLAYED
    protocol (minReaderVersion 2) and the columnMapping configuration, not
    silently downgrade to v1 / drop the marker (ADVICE r3)."""
    from duck_delta_share_spark.sources.delta_log import checkpoint

    t = _mapped_table(tmp_path)
    v = checkpoint(t)
    cp = pq.read_table(t / "_delta_log" / f"{v:020d}.checkpoint.parquet")
    rows = cp.to_pylist()
    protos = [
        r["protocol"]
        for r in rows
        if r.get("protocol") and r["protocol"].get("minReaderVersion") is not None
    ]
    assert protos and protos[0]["minReaderVersion"] == 2
    assert protos[0]["minWriterVersion"] == 5
    metas = [
        r["metaData"] for r in rows if r.get("metaData") and r["metaData"].get("id")
    ]
    conf = dict(metas[0]["configuration"])
    assert conf.get("delta.columnMapping.mode") == "name"
    # truncate the log: the snapshot must come from the checkpoint alone
    for p in (t / "_delta_log").glob("*.json"):
        p.unlink()
    df = read_delta(spark, t)
    assert set(df.columns) == {"id", "name", "region"}
    assert df.count() == 4


def _physical_columns(table) -> set[str]:
    cols = set()
    for p in sorted(table.rglob("*.parquet")):
        if "_delta_log" in p.parts:
            continue
        cols |= set(pq.read_schema(p).names)
    return cols


def test_mapped_delete_where(spark, tmp_path):
    """DV DELETE on a mapped table: condition in LOGICAL names evaluated
    over PHYSICAL parquet columns; protocol upgrade keeps columnMapping."""
    t = _mapped_table(tmp_path)
    res = delete_where(spark, t, "id = 2 OR region = 'us'")
    assert res["rows_deleted"] == 3
    rows = sorted((r.id, r.name) for r in read_delta(spark, t).collect())
    assert rows == [(1, "a")]
    proto = snapshot(t).protocol
    assert set(proto["readerFeatures"]) >= {"deletionVectors", "columnMapping"}


def test_mapped_merge_upsert(spark, tmp_path):
    """MERGE on a mapped table stages files with PHYSICAL names and
    physical-keyed stats; the scan translates back to logical."""
    t = _mapped_table(tmp_path)
    updates = spark.createDataFrame(
        [(2, "B2", "eu"), (99, "new", "apac")], "id long, name string, region string"
    )
    res = merge_delta(spark, t, updates, ["id"])
    assert res["files_rewritten"] >= 1
    rows = sorted((r.id, r.name, r.region) for r in read_delta(spark, t).collect())
    assert rows == [
        (1, "a", "eu"), (2, "B2", "eu"), (10, "x", "us"), (20, "y", "us"),
        (99, "new", "apac"),
    ]
    # every live parquet file uses physical column names only
    assert _physical_columns(t) <= {"col-aaa111", "col-bbb222", "col-ccc333"}
    # stats keys in the new add actions are physical too (prunable)
    new_stats = [
        json.loads(f["stats"]) for f in snapshot(t).files if f.get("stats")
    ]
    for st in new_stats:
        for section in ("minValues", "maxValues"):
            assert all(k.startswith("col-") for k in st.get(section, {}))


def test_mapped_write_append_and_overwrite(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_log import write_delta

    t = _mapped_table(tmp_path)
    extra = spark.createDataFrame([(30, "q", "eu")], "id long, name string, region string")
    write_delta(extra, t, mode="append")
    rows = sorted(r.id for r in read_delta(spark, t).collect())
    assert rows == [1, 2, 10, 20, 30]
    assert _physical_columns(t) <= {"col-aaa111", "col-bbb222", "col-ccc333"}
    # overwrite keeps the mapped schemaString + configuration
    write_delta(extra, t, mode="overwrite")
    snap = snapshot(t)
    assert "delta.columnMapping.physicalName" in snap.schema_string
    assert snap.configuration.get("delta.columnMapping.mode") == "name"
    assert [r.id for r in read_delta(spark, t).collect()] == [30]


def test_mapped_optimize_compacts(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_log import optimize

    t = _mapped_table(tmp_path)
    res = optimize(spark, t)
    assert res["files_after"] < res["files_before"]
    rows = sorted((r.id, r.region) for r in read_delta(spark, t).collect())
    assert rows == [(1, "eu"), (2, "eu"), (10, "us"), (20, "us")]
    assert _physical_columns(t) <= {"col-aaa111", "col-bbb222", "col-ccc333"}


def test_mapped_schema_evolution_append(spark, tmp_path):
    """r4: evolution on mapped tables assigns fresh field ids + col-<uuid>
    physical names instead of failing fast."""
    import json as _json

    from duck_delta_share_spark.sources.delta_log import (
        read_delta,
        snapshot,
        write_delta,
    )

    t = _mapped_table(tmp_path)
    extra = spark.createDataFrame(
        [(100, "z", "eu", 5)], "id long, name string, region string, extra long"
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        write_delta(extra, t)
    write_delta(extra, t, merge_schema=True)
    snap = snapshot(t)
    fields = {f["name"]: f for f in _json.loads(snap.schema_string)["fields"]}
    meta = fields["extra"]["metadata"]
    assert meta["delta.columnMapping.id"] == 4
    assert meta["delta.columnMapping.physicalName"].startswith("col-")
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "4"
    # existing fields keep their original mapping
    assert fields["id"]["metadata"]["delta.columnMapping.physicalName"] == "col-aaa111"
    rows = {r.id: r for r in read_delta(spark, t).collect()}
    assert rows[100].extra == 5
    assert all(rows[i].extra is None for i in rows if i != 100)
    # the staged parquet uses the PHYSICAL name
    assert any(
        c.startswith("col-") and c not in ("col-aaa111", "col-bbb222", "col-ccc333")
        for c in _physical_columns(t)
    )


def test_mapped_subset_append_null_fills(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    t = _mapped_table(tmp_path)
    write_delta(
        spark.createDataFrame([(200, "only-id-name")], "id long, name string"), t
    )
    rows = {r.id: r for r in read_delta(spark, t).collect()}
    assert rows[200].region is None and rows[200].name == "only-id-name"


def test_mapped_schema_evolution_overwrite(spark, tmp_path):
    import json as _json

    from duck_delta_share_spark.sources.delta_log import (
        read_delta,
        snapshot,
        write_delta,
    )

    t = _mapped_table(tmp_path)
    widened = spark.createDataFrame(
        [(1, "z", "eu", 5)], "id long, name string, region string, extra long"
    )
    write_delta(widened, t, mode="overwrite")
    snap = snapshot(t)
    fields = {f["name"]: f for f in _json.loads(snap.schema_string)["fields"]}
    assert fields["extra"]["metadata"]["delta.columnMapping.id"] == 4
    assert fields["name"]["metadata"]["delta.columnMapping.physicalName"] == "col-bbb222"
    out = read_delta(spark, t).collect()
    assert len(out) == 1 and out[0].extra == 5


def test_rename_column_metadata_only(spark, tmp_path):
    """RENAME COLUMN on a mapped table: one metaData commit, zero files
    touched, reads resolve the NEW logical name against the OLD physical
    parquet columns; guards refuse duplicates/unknowns/unmapped tables."""
    from duck_delta_share_spark.sources.delta_log import (
        rename_column,
        write_delta,
    )

    t = _mapped_table(tmp_path)
    files_before = sorted(p.name for p in t.glob("*.parquet"))
    v = rename_column(t, "name", "label")
    assert v == 1
    assert sorted(p.name for p in t.glob("*.parquet")) == files_before
    df = read_delta(spark, t)
    assert set(df.columns) == {"id", "label", "region"}
    rows = sorted((r.id, r.label) for r in df.collect())
    assert rows == [(1, "a"), (2, "b"), (10, "x"), (20, "y")]
    # the field kept its physicalName: stats pruning on id still works,
    # and appends through the renamed schema land physically
    write_delta(
        spark.createDataFrame([(30, "z", "ap")], "id long, label string, region string"),
        t,
    )
    assert read_delta(spark, t).where("label = 'z'").count() == 1
    with pytest.raises(ValueError, match="already exists"):
        rename_column(t, "id", "label")
    with pytest.raises(ValueError, match="no column"):
        rename_column(t, "ghost", "x")


def test_rename_partition_column_updates_partition_columns(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_log import rename_column

    t = _mapped_table(tmp_path, partitioned=True)
    rename_column(t, "region", "geo")
    snap = snapshot(t)
    assert list(snap.partition_columns) == ["geo"]
    df = read_delta(spark, t)
    assert sorted(r.id for r in df.where("geo = 'us'").collect()) == [10, 20]


def test_drop_column_metadata_only(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_log import (
        drop_column,
        rename_column,
    )

    t = _mapped_table(tmp_path)
    drop_column(t, "name")
    df = read_delta(spark, t)
    assert set(df.columns) == {"id", "region"}
    assert df.count() == 4
    with pytest.raises(ValueError, match="partition column"):
        drop_column(_mapped_table(tmp_path / "p", partitioned=True), "region")
    # dropped field's ghost bytes stay in the files; the reader never
    # surfaces them, and renaming another column still works after
    rename_column(t, "id", "ident")
    assert sorted(r.ident for r in read_delta(spark, t).collect()) == [1, 2, 10, 20]


def test_rename_drop_refuse_unmapped_and_references(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_log import (
        add_check_constraint,
        drop_column,
        rename_column,
        write_delta,
    )

    plain = tmp_path / "plain"
    write_delta(spark.createDataFrame([(1, 2.0)], "id long, v double"), plain)
    with pytest.raises(ValueError, match="columnMapping"):
        rename_column(plain, "v", "w")
    with pytest.raises(ValueError, match="columnMapping"):
        drop_column(plain, "v")

    t = _mapped_table(tmp_path)
    add_check_constraint(spark, t, "id_pos", "id >= 0")
    with pytest.raises(ValueError, match="CHECK constraint id_pos"):
        rename_column(t, "id", "ident")
    with pytest.raises(ValueError, match="CHECK constraint id_pos"):
        drop_column(t, "id")
    # unreferenced columns still rename fine under the constraint
    rename_column(t, "name", "label")
    assert "label" in read_delta(spark, t).columns


def test_enable_column_mapping_then_rename_full_lifecycle(spark, tmp_path):
    """The delta-spark upgrade path: a PLAIN table our writer created gets
    column mapping enabled in place (physicalName frozen to the current
    names — the files already store them), then rename/drop/append/merge/
    DV-delete all work through the mapped machinery."""
    from duck_delta_share_spark.sources.delta_log import (
        delete_where,
        drop_column,
        enable_column_mapping,
        merge_delta,
        rename_column,
        write_delta,
    )

    t = tmp_path / "up"
    write_delta(
        spark.createDataFrame(
            [(i, f"n{i}", i * 1.0, "x") for i in range(10)],
            "id long, name string, v double, junk string",
        ),
        t,
    )
    with pytest.raises(ValueError, match="columnMapping"):
        rename_column(t, "name", "label")  # not mapped yet
    v = enable_column_mapping(t)
    snap = snapshot(t)
    proto = snap.protocol
    assert proto["minReaderVersion"] >= 2 and proto["minWriterVersion"] >= 5
    sch = json.loads(snap.schema_string)
    assert all(
        f["metadata"]["delta.columnMapping.physicalName"] == f["name"]
        for f in sch["fields"]
    )
    with pytest.raises(ValueError, match="already has column mapping"):
        enable_column_mapping(t)

    rename_column(t, "name", "label")
    drop_column(t, "junk")
    df = read_delta(spark, t)
    assert set(df.columns) == {"id", "label", "v"}
    assert {r.label for r in df.collect()} == {f"n{i}" for i in range(10)}
    # append + merge + DV delete through the renamed logical schema
    write_delta(
        spark.createDataFrame([(10, "n10", 10.0)], "id long, label string, v double"),
        t,
    )
    merge_delta(
        spark,
        t,
        spark.createDataFrame([(0, "N0", 0.5)], "id long, label string, v double"),
        ["id"],
    )
    delete_where(spark, t, "id = 5")
    rows = {r.id: (r.label, r.v) for r in read_delta(spark, t).collect()}
    assert rows[0] == ("N0", 0.5) and rows[10] == ("n10", 10.0)
    assert 5 not in rows and len(rows) == 10
    # five commits after the upgrade: rename, drop, append, merge, delete
    assert snapshot(t).version == v + 5


def test_update_where_after_mapping_upgrade_and_rename(spark, tmp_path):
    """UPDATE...SET composes with the mapping upgrade + rename: the
    logical predicate and assignments resolve against renamed columns
    while files stay physically named from before the upgrade."""
    from duck_delta_share_spark.sources.delta_log import (
        enable_column_mapping,
        rename_column,
        update_where,
        write_delta,
    )

    t = tmp_path / "updmap"
    write_delta(
        spark.createDataFrame(
            [(i, i * 1.0) for i in range(8)], "id long, price double"
        ),
        t,
    )
    enable_column_mapping(t)
    rename_column(t, "price", "amount")
    res = update_where(spark, t, "amount >= 5.0", {"amount": "amount * 2"})
    assert res["rows_updated"] == 3
    rows = {r.id: r.amount for r in read_delta(spark, t).collect()}
    assert rows[7] == 14.0 and rows[4] == 4.0
