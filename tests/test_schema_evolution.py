"""Schema evolution on the local Delta write path (delta-spark
``mergeSchema`` semantics): evolved appends rewrite metaData with the
union schema, pre-evolution files read back with typed nulls, subset
appends null-fill, and time travel recovers the pre-evolution schema."""

from __future__ import annotations

import pytest

from duck_delta_share_spark.sources.delta_log import (
    delete_where,
    read_delta,
    snapshot,
    write_delta,
)


def _base(spark, tmp_path, partition_by=None):
    t = tmp_path / "t"
    df = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(10)], "id bigint, name string"
    )
    write_delta(df, t, partition_by=partition_by)
    return t


def test_new_column_requires_merge_schema(spark, tmp_path):
    t = _base(spark, tmp_path)
    df2 = spark.createDataFrame([(10, "x", 1.5)], "id bigint, name string, score double")
    with pytest.raises(ValueError, match="merge_schema=True"):
        write_delta(df2, t)


def test_evolved_append_null_fills_old_files(spark, tmp_path):
    t = _base(spark, tmp_path)
    df2 = spark.createDataFrame(
        [(10, "x", 1.5), (11, "y", 2.5)], "id bigint, name string, score double"
    )
    write_delta(df2, t, merge_schema=True)
    out = read_delta(spark, t)
    assert [f.name for f in out.schema.fields] == ["id", "name", "score"]
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 12
    assert rows[0]["score"] is None and rows[10]["score"] == 1.5
    # filter on the evolved column excludes pre-evolution rows
    assert read_delta(spark, t).where("score IS NOT NULL").count() == 2
    # projecting ONLY the evolved column still counts every row
    # (empty-column parquet reads preserve num_rows)
    assert read_delta(spark, t).select("score").count() == 12


def test_subset_append_allowed_without_flag(spark, tmp_path):
    t = _base(spark, tmp_path)
    df2 = spark.createDataFrame([(20,)], "id bigint")
    write_delta(df2, t)  # subset of columns: no evolution, no flag needed
    rows = {r["id"]: r for r in read_delta(spark, t).collect()}
    assert rows[20]["name"] is None and len(rows) == 11


def test_type_conflict_rejected(spark, tmp_path):
    t = _base(spark, tmp_path)
    df2 = spark.createDataFrame([(30, 5)], "id bigint, name bigint")
    with pytest.raises(ValueError, match="conflict"):
        write_delta(df2, t, merge_schema=True)


def test_missing_partition_column_rejected(spark, tmp_path):
    t = tmp_path / "p"
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "id bigint, name string, part string"
    )
    write_delta(df, t, partition_by=["part"])
    bad = spark.createDataFrame([(3, "c")], "id bigint, name string")
    with pytest.raises(ValueError, match="partition column"):
        write_delta(bad, t)


def test_time_travel_recovers_old_schema(spark, tmp_path):
    t = _base(spark, tmp_path)
    df2 = spark.createDataFrame([(10, "x", 1.5)], "id bigint, name string, score double")
    write_delta(df2, t, merge_schema=True)
    v0 = read_delta(spark, t, version=0)
    assert [f.name for f in v0.schema.fields] == ["id", "name"]
    assert v0.count() == 10
    assert snapshot(t).schema_string != snapshot(t, version=0).schema_string


def test_evolved_field_forced_nullable(spark, tmp_path):
    t = _base(spark, tmp_path)
    # a non-nullable source column must become nullable in the table
    df2 = spark.createDataFrame([(10, "x", 1)], "id bigint, name string, n int")
    df2 = df2.withColumn("n", df2["n"] + 0)  # keep planner honest
    write_delta(df2.selectExpr("id", "name", "CAST(n AS INT) AS n"), t, merge_schema=True)
    f = [f for f in read_delta(spark, t).schema.fields if f.name == "n"][0]
    assert f.nullable


def test_maintenance_after_evolution(spark, tmp_path):
    t = _base(spark, tmp_path)
    df2 = spark.createDataFrame([(10, "x", 1.5)], "id bigint, name string, score double")
    write_delta(df2, t, merge_schema=True)
    delete_where(spark, t, "id >= 8")
    rows = {r["id"]: r for r in read_delta(spark, t).collect()}
    assert set(rows) == set(range(8))
    assert rows[3]["score"] is None
