"""CHECK constraints (delta.constraints.* enforcement on write/merge,
ALTER-style add/drop commits, protocol upgrade) and lossless type widening
on merge_schema appends."""

from __future__ import annotations

import pytest

from duck_delta_share_spark.sources.delta_log import (
    add_check_constraint,
    drop_check_constraint,
    merge_delta,
    read_delta,
    snapshot,
    write_delta,
)


def _t(spark, tmp_path):
    t = tmp_path / "t"
    df = spark.createDataFrame(
        [(1, 50.0), (2, 75.0)], "id bigint, score double"
    )
    write_delta(df, t)
    return t


def test_constraint_blocks_bad_append(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "score_range", "score BETWEEN 0 AND 100")
    good = spark.createDataFrame([(3, 99.0)], "id bigint, score double")
    write_delta(good, t)
    bad = spark.createDataFrame([(4, 150.0)], "id bigint, score double")
    with pytest.raises(ValueError, match="score_range"):
        write_delta(bad, t)
    assert read_delta(spark, t).count() == 3
    # NULL passes (SQL CHECK semantics)
    nullrow = spark.createDataFrame([(5, None)], "id bigint, score double")
    write_delta(nullrow, t)
    assert read_delta(spark, t).count() == 4


def test_constraint_blocks_bad_merge(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "pos_id", "id > 0")
    bad = spark.createDataFrame([(-1, 10.0)], "id bigint, score double")
    with pytest.raises(ValueError, match="pos_id"):
        merge_delta(spark, t, bad, ["id"])
    ok = spark.createDataFrame([(1, 60.0)], "id bigint, score double")
    merge_delta(spark, t, ok, ["id"])
    rows = {r.id: r.score for r in read_delta(spark, t).collect()}
    assert rows[1] == 60.0


def test_add_validates_existing_rows(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(ValueError, match="existing table"):
        add_check_constraint(spark, t, "tiny", "score < 60")
    # unvalidated add is allowed for tooling
    add_check_constraint(spark, t, "tiny", "score < 60", validate=False)


def test_add_drop_roundtrip_and_protocol(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "c1", "id > 0")
    s = snapshot(t)
    assert s.configuration["delta.constraints.c1"] == "id > 0"
    assert int(s.protocol["minWriterVersion"]) >= 3
    with pytest.raises(ValueError, match="already exists"):
        add_check_constraint(spark, t, "c1", "id > 0")
    drop_check_constraint(t, "c1")
    assert "delta.constraints.c1" not in snapshot(t).configuration
    with pytest.raises(ValueError, match="no constraint"):
        drop_check_constraint(t, "c1")
    # dropped constraint no longer blocks
    write_delta(spark.createDataFrame([(-9, 1.0)], "id bigint, score double"), t)


def test_constraints_survive_overwrite(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "c", "score >= 0")
    write_delta(
        spark.createDataFrame([(9, 1.0)], "id bigint, score double"),
        t,
        mode="overwrite",
    )
    assert "delta.constraints.c" in snapshot(t).configuration
    with pytest.raises(ValueError, match="CHECK constraint c"):
        write_delta(
            spark.createDataFrame([(10, -5.0)], "id bigint, score double"), t
        )


def test_widening_append_evolves_table_type(spark, tmp_path):
    t = tmp_path / "w"
    write_delta(
        spark.createDataFrame([(1, 10, 1.5)], "id bigint, n int, x float"), t
    )
    # long n / double x: table schema widens, old int32/float files upcast
    write_delta(
        spark.createDataFrame([(2, 2**40, 2.5)], "id bigint, n long, x double"),
        t,
        merge_schema=True,
    )
    out = read_delta(spark, t)
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["n"] == "bigint" and types["x"] == "double"
    rows = {r.id: (r.n, r.x) for r in out.collect()}
    assert rows[1] == (10, 1.5) and rows[2] == (2**40, 2.5)


def test_widening_requires_merge_schema(spark, tmp_path):
    t = tmp_path / "w"
    write_delta(spark.createDataFrame([(1, 10)], "id bigint, n int"), t)
    with pytest.raises(ValueError, match="conflict"):
        write_delta(spark.createDataFrame([(2, 2**40)], "id bigint, n long"), t)


def test_narrower_append_upcasts_at_read(spark, tmp_path):
    t = tmp_path / "w"
    write_delta(spark.createDataFrame([(1, 2**40)], "id bigint, n long"), t)
    # int32 append into a long column: allowed without any flag
    write_delta(spark.createDataFrame([(2, 7)], "id bigint, n int"), t)
    out = read_delta(spark, t)
    assert [f.dataType.simpleString() for f in out.schema.fields if f.name == "n"] == ["bigint"]
    assert {r.n for r in out.collect()} == {2**40, 7}


def test_lossy_conflict_still_rejected(spark, tmp_path):
    t = tmp_path / "w"
    write_delta(spark.createDataFrame([(1, 2**40)], "id bigint, n long"), t)
    with pytest.raises(ValueError, match="conflict"):
        write_delta(
            spark.createDataFrame([(2, "x")], "id bigint, n string"),
            t,
            merge_schema=True,
        )
