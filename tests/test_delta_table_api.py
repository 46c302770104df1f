"""DeltaTable façade: the delta-spark-style object API drives the same
tested functional surface end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql.types import IntegerType, StructField, StructType

from duck_delta_share_spark.table import DeltaTable


def test_object_api_lifecycle(spark, tmp_path):
    t = DeltaTable.createFrom(
        spark,
        spark.range(30).selectExpr("id AS k", "id * 2 AS v").repartition(3),
        tmp_path / "t",
    )
    assert t.version() == 0
    assert t.toDF().count() == 30
    t.write(spark.range(30, 35).selectExpr("id AS k", "id*2 AS v"))
    t.merge(spark.createDataFrame([(0, 999)], "k long, v long"), ["k"])
    t.delete("k >= 33")
    assert t.toDF().count() == 33
    assert {r.v for r in t.toDF().where("k = 0").collect()} == {999}
    res = t.optimize()
    assert res["files_after"] <= res["files_before"]
    ops = [h["operation"] for h in t.history()]
    assert ops[0] == "OPTIMIZE" and "MERGE" in ops and "DELETE" in ops
    # time travel + restore through the handle
    assert t.toDF(version=0).count() == 30
    t.restore(0)
    assert t.toDF().count() == 30
    # clone through the handle
    c = t.clone(tmp_path / "c")
    assert c.toDF().count() == 30
    t.checkpoint()
    assert t.toDF().count() == 30


def test_for_path_fails_fast(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        DeltaTable.forPath(spark, tmp_path / "nope")


def test_convert_typed_partitions(spark, tmp_path):
    d = tmp_path / "typed"
    df = spark.createDataFrame(
        [(1, 2023), (2, 2023), (3, 2024)], "id long, year int"
    )
    df.write.partitionBy("year").parquet(str(d))
    t = DeltaTable.convertFromParquet(
        spark,
        d,
        partition_schema=StructType([StructField("year", IntegerType())]),
    )
    out = t.toDF()
    assert dict(out.dtypes)["year"] == "int"  # typed, not string
    assert out.where("year = 2023").count() == 2
