"""CONVERT TO DELTA (in-place parquet import, no rewrite) and SHALLOW
CLONE (zero-copy table fork via absolute-path add actions)."""

from __future__ import annotations

import json

import pytest

from duck_delta_share_spark.sources.delta_log import (
    clone_delta,
    convert_to_delta,
    delete_where,
    merge_delta,
    read_delta,
    snapshot,
    write_delta,
)


def test_convert_plain_directory(spark, tmp_path):
    d = tmp_path / "plain"
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    df.repartition(3).write.parquet(str(d))
    assert convert_to_delta(spark, d) == 0
    snap = snapshot(d)
    assert len(snap.files) >= 3
    # stats were computed from the existing footers (pruning works)
    stats = json.loads(snap.files[0]["stats"])
    assert stats["numRecords"] > 0 and "k" in stats["minValues"]
    back = read_delta(spark, d)
    assert back.count() == 100
    assert {r.k for r in back.collect()} == set(range(100))
    # the table is fully functional: append + delete after conversion
    write_delta(spark.range(100, 105).selectExpr("id AS k", "id*2 AS v"), d)
    delete_where(spark, d, "k < 10")
    assert read_delta(spark, d).count() == 95
    with pytest.raises(ValueError, match="already a Delta table"):
        convert_to_delta(spark, d)


def test_convert_hive_partitioned(spark, tmp_path):
    d = tmp_path / "hive"
    df = spark.createDataFrame(
        [(1, "eu"), (2, "eu"), (3, "us")], "id long, region string"
    )
    df.write.partitionBy("region").parquet(str(d))
    convert_to_delta(spark, d)
    snap = snapshot(d)
    assert snap.partition_columns == ("region",)
    back = read_delta(spark, d)
    assert {(r.id, r.region) for r in back.collect()} == {
        (1, "eu"), (2, "eu"), (3, "us")
    }
    # partition pruning via partitionValues works on the converted table
    assert back.where("region = 'eu'").count() == 2


def test_shallow_clone_and_divergence(spark, tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    write_delta(
        spark.range(50).selectExpr("id AS k", "id * 3 AS v").repartition(2), src
    )
    delete_where(spark, src, "k >= 45")  # carry DV state into the clone
    res = clone_delta(src, dst)
    assert res["files_referenced"] == 2
    assert read_delta(spark, dst).count() == 45  # DV mask carried over
    # clone diverges without touching the source
    write_delta(spark.range(100, 103).selectExpr("id AS k", "id*3 AS v"), dst)
    merge_delta(
        spark, dst, spark.createDataFrame([(0, 999)], "k long, v long"), ["k"]
    )
    assert read_delta(spark, dst).count() == 48
    assert {r.v for r in read_delta(spark, dst).where("k = 0").collect()} == {999}
    assert read_delta(spark, src).count() == 45  # source untouched
    assert {r.v for r in read_delta(spark, src).where("k = 0").collect()} == {0}
    # delete on the clone masks a FOREIGN (absolute-path) file
    delete_where(spark, dst, "k = 1")
    assert read_delta(spark, dst).count() == 47
    assert read_delta(spark, src).count() == 45


def test_clone_at_version(spark, tmp_path):
    src = tmp_path / "s2"
    dst = tmp_path / "d2"
    write_delta(spark.range(10).selectExpr("id AS k"), src)       # v0
    write_delta(spark.range(10, 20).selectExpr("id AS k"), src)   # v1
    clone_delta(src, dst, version=0)
    assert read_delta(spark, dst).count() == 10
    assert read_delta(spark, src).count() == 20


def test_convert_rejects_mixed_layout(spark, tmp_path):
    """A directory where some files carry the col=value segments and some
    do not must fail loudly (ADVICE r4) — silently inheriting the first
    file's partition keys would write inconsistent partitionValues."""
    d = tmp_path / "mixed"
    spark.createDataFrame([(1, "eu")], "id long, region string").write.parquet(
        str(d / "region=eu"), mode="overwrite"
    )
    # a stray unpartitioned file at the root
    spark.createDataFrame([(9,)], "id long").coalesce(1).write.parquet(
        str(d / "flat"), mode="overwrite"
    )
    import shutil

    stray = next((d / "flat").glob("*.parquet"))
    shutil.move(str(stray), str(d / stray.name))
    shutil.rmtree(d / "flat")
    with pytest.raises(ValueError, match="inconsistent hive layout"):
        convert_to_delta(spark, d)
