"""Adversarial-schema lens (r6 session 2): Delta PROTOCOL.md forbids
parquet-hostile characters in field names unless column mapping provides
the logical/physical indirection. Writing them anyway mints a table
delta-spark refuses to read — our writer must fail loud instead."""

from __future__ import annotations

import pytest

from duck_delta_share_spark.sources.delta_log import (
    convert_to_delta,
    enable_column_mapping,
    read_delta,
    write_delta,
)


def test_invalid_top_level_name_rejected_without_mapping(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], ["id", "bad name"])
    with pytest.raises(ValueError, match="invalid in parquet field names"):
        write_delta(df, tmp_path / "t")
    # no commit landed and no data files were staged
    assert not list((tmp_path / "t").rglob("*.json"))
    assert not list((tmp_path / "t").rglob("*.parquet"))


@pytest.mark.parametrize("name", ["a,b", "a;b", "a{b", "a}b", "a(b", "a)b",
                                  "a=b", "a\tb", "a\nb"])
def test_each_forbidden_character_rejected(spark, tmp_path, name):
    df = spark.createDataFrame([(1,)], ["id"]).withColumnRenamed("id", name)
    with pytest.raises(ValueError, match="invalid in parquet field names"):
        write_delta(df, tmp_path / f"t_{abs(hash(name))}")


def test_invalid_nested_field_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, {"ok": 1, "not ok": 2})],
        "id int, s struct<ok:int, `not ok`:int>",
    )
    with pytest.raises(ValueError, match="s.not ok"):
        write_delta(df, tmp_path / "t")


def test_invalid_name_in_evolution_rejected(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1,)], "id int"), t)
    bad = spark.createDataFrame([(2, "x")], ["id", "new col"])
    with pytest.raises(ValueError, match="invalid in parquet field names"):
        write_delta(bad, t, mode="append", merge_schema=True)
    assert read_delta(spark, t).count() == 1  # table unchanged


def test_unusual_but_legal_names_accepted(spark, tmp_path):
    # the spec forbids ONLY " ,;{}()\n\t=" — hyphens, unicode, quotes
    # are legal parquet field names and must keep working
    t = tmp_path / "t"
    df = spark.createDataFrame([(1, 2.0, "x")], ["a-b", "naïve", "it's"])
    write_delta(df, t)
    back = read_delta(spark, t)
    assert sorted(back.columns) == sorted(["a-b", "naïve", "it's"])
    assert back.count() == 1


def test_mapped_table_accepts_any_logical_name(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(spark.createDataFrame([(1, "a")], "id int, v string"), t)
    enable_column_mapping(t)
    evolved = spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "bad name"])
    write_delta(evolved, t, mode="append", merge_schema=True)
    back = read_delta(spark, t)
    assert "bad name" in back.columns
    rows = {r["id"]: r["bad name"] for r in back.collect()}
    assert rows == {1: None, 2: 9.5}


def test_convert_rejects_foreign_parquet_with_invalid_names(spark, tmp_path):
    lake = tmp_path / "lake"
    spark.createDataFrame([(1, "x")], ["id", "bad name"]).write.parquet(
        str(lake)
    )
    with pytest.raises(ValueError, match="invalid in parquet field names"):
        convert_to_delta(spark, lake)
    assert not (lake / "_delta_log").exists()
