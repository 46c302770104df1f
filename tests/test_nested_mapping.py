"""NESTED column mapping: struct fields at depth carry their own
delta.columnMapping.physicalName — reads relabel with a zero-copy arrow
view, appends cast to the physical nested layout, delete_where reads the
physical layout and masks rows with deletion vectors under logical
predicates (including predicates ON nested fields)."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

from duck_delta_share_spark.sources.delta_log import (
    delete_where,
    read_delta,
    write_delta,
)


def _nested_mapped_table(tmp_path):
    """Hand-build a delta-spark-style table whose struct column has
    physical names at BOTH levels: addr -> col-top, addr.city -> col-c,
    addr.zip -> col-z."""
    t = tmp_path / "nested"
    (t / "_delta_log").mkdir(parents=True)
    fields = [
        {
            "name": "id",
            "type": "long",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": "col-id",
            },
        },
        {
            "name": "addr",
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "name": "city",
                        "type": "string",
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.id": 3,
                            "delta.columnMapping.physicalName": "col-c",
                        },
                    },
                    {
                        "name": "zip",
                        "type": "long",
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.id": 4,
                            "delta.columnMapping.physicalName": "col-z",
                        },
                    },
                ],
            },
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": "col-top",
            },
        },
    ]
    data = pa.table(
        {
            "col-id": pa.array([1, 2], pa.int64()),
            "col-top": pa.array(
                [{"col-c": "ber", "col-z": 10}, None],
                type=pa.struct([("col-c", pa.string()), ("col-z", pa.int64())]),
            ),
        }
    )
    pq.write_table(data, t / "part-0.parquet")
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "nested-test",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps({"type": "struct", "fields": fields}),
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "4",
                },
            }
        },
        {"add": {"path": "part-0.parquet", "partitionValues": {}, "dataChange": True}},
    ]
    (t / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )
    return t


def test_nested_read_logical_names(spark, tmp_path):
    t = _nested_mapped_table(tmp_path)
    out = read_delta(spark, t)
    assert [f.name for f in out.schema["addr"].dataType.fields] == ["city", "zip"]
    rows = {r.id: r.addr for r in out.collect()}
    assert rows[1].city == "ber" and rows[1].zip == 10
    assert rows[2] is None
    # nested field projection works under logical names
    assert out.select("addr.city").where("addr.city = 'ber'").count() == 1


def test_nested_append_stages_physical(spark, tmp_path):
    t = _nested_mapped_table(tmp_path)
    df = spark.createDataFrame(
        [(3, ("par", 75))], "id long, addr struct<city:string, zip:long>"
    )
    write_delta(df, t)
    rows = {r.id: r.addr for r in read_delta(spark, t).collect()}
    assert rows[3].city == "par" and rows[3].zip == 75
    # the staged parquet physically uses col-c / col-z
    staged = [
        p for p in t.glob("*.parquet") if p.name != "part-0.parquet"
    ]
    assert staged
    sch = pq.ParquetFile(staged[0]).schema_arrow
    top = sch.field("col-top").type
    assert [top.field(i).name for i in range(top.num_fields)] == ["col-c", "col-z"]


def test_nested_delete_top_level_predicate(spark, tmp_path):
    t = _nested_mapped_table(tmp_path)
    res = delete_where(spark, t, "id = 1")
    assert res["rows_deleted"] == 1 and res["files_touched"] == 1
    rows = {r.id: r.addr for r in read_delta(spark, t).collect()}
    assert set(rows) == {2} and rows[2] is None


def test_nested_delete_nested_predicate(spark, tmp_path):
    t = _nested_mapped_table(tmp_path)
    # append one more row so the DV masks within a multi-row file set
    df = spark.createDataFrame(
        [(3, ("par", 75)), (4, ("ber", 99))],
        "id long, addr struct<city:string, zip:long>",
    )
    write_delta(df, t)
    res = delete_where(spark, t, "addr.city = 'ber'")
    assert res["rows_deleted"] == 2  # id=1 (original file) and id=4 (appended)
    out = read_delta(spark, t)
    assert {r.id for r in out.collect()} == {2, 3}
    # repeated delete composes with the existing DV
    res2 = delete_where(spark, t, "addr.zip = 75")
    assert res2["rows_deleted"] == 1
    assert {r.id for r in read_delta(spark, t).collect()} == {2}
