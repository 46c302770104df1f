"""Generated columns (delta.generationExpression field metadata): missing
columns are computed at write time, provided values are validated
null-safely, partition-by-generated-column works, and merges materialize
them on updates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duck_delta_share_spark.sources.delta_log import (
    merge_delta,
    read_delta,
    snapshot,
    write_delta,
)

_GEN = {"delta.generationExpression": "CAST(id % 10 AS BIGINT)"}


def _create(spark, t, partition_by=None):
    df = (
        spark.range(0, 20)
        .selectExpr("id", "CAST(id % 10 AS BIGINT) AS bucket")
        .withMetadata("bucket", _GEN)
    )
    write_delta(df, t, partition_by=partition_by)


def test_append_materializes_missing_generated(spark, tmp_path):
    t = tmp_path / "t"
    _create(spark, t)
    write_delta(spark.range(20, 25).selectExpr("id"), t)
    rows = {r.id: r.bucket for r in read_delta(spark, t).collect()}
    assert len(rows) == 25
    assert all(rows[i] == i % 10 for i in rows)


def test_wrong_provided_values_rejected(spark, tmp_path):
    t = tmp_path / "t"
    _create(spark, t)
    bad = spark.range(30, 33).selectExpr("id", "CAST(0 AS BIGINT) AS bucket")
    with pytest.raises(ValueError, match="generated column bucket"):
        write_delta(bad, t)
    ok = spark.range(30, 33).selectExpr("id", "CAST(id % 10 AS BIGINT) AS bucket")
    write_delta(ok, t)
    assert read_delta(spark, t).count() == 23


def test_generated_partition_column(spark, tmp_path):
    t = tmp_path / "p"
    _create(spark, t, partition_by=["bucket"])
    # append WITHOUT the partition column: generation supplies it
    write_delta(spark.range(20, 24).selectExpr("id"), t)
    out = read_delta(spark, t)
    assert out.count() == 24
    # partition pruning on the generated column still works
    assert out.where("bucket = 3").count() == 3  # ids 3, 13, 23


def test_merge_updates_materialize_generated(spark, tmp_path):
    t = tmp_path / "t"
    _create(spark, t)
    merge_delta(spark, t, spark.range(100, 102).selectExpr("id"), ["id"])
    rows = {r.id: r.bucket for r in read_delta(spark, t).collect()}
    assert rows[100] == 0 and rows[101] == 1


def test_metadata_persists_in_schema(spark, tmp_path):
    t = tmp_path / "t"
    _create(spark, t)
    assert "delta.generationExpression" in snapshot(t).schema_string
