"""Column DEFAULT values (protocol "Default Columns", allowColumnDefaults
writer feature: CURRENT_DEFAULT field metadata) and the vacuumProtocolCheck
reader+writer feature gate."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from duck_delta_share_spark.sources.delta_log import (
    enable_vacuum_protocol_check,
    merge_delta,
    read_delta,
    snapshot,
    vacuum,
    write_delta,
)

_DEFAULTS_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("status", StringType(), True, {"CURRENT_DEFAULT": "'new'"}),
        StructField("score", DoubleType(), True, {"CURRENT_DEFAULT": "0.5"}),
    ]
)


def _create(spark, t):
    df = spark.createDataFrame([(0, "seed", 9.0)], _DEFAULTS_SCHEMA)
    write_delta(df, t)


def test_create_advertises_allow_column_defaults(spark, tmp_path):
    t = tmp_path / "t"
    _create(spark, t)
    proto = snapshot(t).protocol
    assert proto["minWriterVersion"] == 7
    assert "allowColumnDefaults" in proto["writerFeatures"]
    # legacy baseline features stay listed after the v7 conversion
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])


def test_append_fills_missing_defaults_provided_wins(spark, tmp_path):
    t = tmp_path / "t"
    _create(spark, t)
    # omit BOTH defaulted columns
    write_delta(spark.createDataFrame([(1,)], "id long"), t)
    # omit one, provide the other (provided value wins over the default)
    write_delta(
        spark.createDataFrame([(2, "done")], "id long, status string"), t
    )
    rows = {r.id: (r.status, r.score) for r in read_delta(spark, t).collect()}
    assert rows[0] == ("seed", 9.0)
    assert rows[1] == ("new", 0.5)
    assert rows[2] == ("done", 0.5)


def test_merge_fills_missing_defaults(spark, tmp_path):
    t = tmp_path / "t"
    _create(spark, t)
    merge_delta(
        spark,
        t,
        spark.createDataFrame([(0,), (5,)], "id long"),
        ["id"],
    )
    rows = {r.id: (r.status, r.score) for r in read_delta(spark, t).collect()}
    assert rows[5] == ("new", 0.5)  # inserted row got the defaults
    assert rows[0] == ("new", 0.5)  # merge replaces whole rows


def test_default_clashing_with_generated_rejected(spark, tmp_path):
    bad = StructType(
        [
            StructField("id", LongType(), True),
            StructField(
                "b",
                LongType(),
                True,
                {
                    "CURRENT_DEFAULT": "7",
                    "delta.generationExpression": "id % 10",
                },
            ),
        ]
    )
    df = spark.createDataFrame([(1, 1)], bad)
    with pytest.raises(ValueError, match="CURRENT_DEFAULT alongside"):
        write_delta(df, tmp_path / "bad")


def test_vacuum_protocol_check_gate(spark, tmp_path):
    t = tmp_path / "v"
    write_delta(spark.range(10).selectExpr("id AS k"), t)
    v = enable_vacuum_protocol_check(t)
    proto = snapshot(t).protocol
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "vacuumProtocolCheck" in proto["readerFeatures"]
    assert "vacuumProtocolCheck" in proto["writerFeatures"]
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])
    # our own vacuum implements the check, so it keeps working
    assert vacuum(t, retain_hours=1e6)["files_removed"] == 0
    # reads and writes still work after the upgrade commit
    write_delta(spark.range(10, 12).selectExpr("id AS k"), t)
    assert read_delta(spark, t).count() == 12
    assert snapshot(t).version == v + 1

    # a table demanding a vacuum-relevant feature we DON'T implement is
    # refused by vacuum's writer gate
    import json as _json
    from pathlib import Path

    log = Path(t) / "_delta_log"
    ver = snapshot(t).version + 1
    with open(log / f"{ver:020d}.json", "w") as fh:
        fh.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["vacuumProtocolCheck"],
                        "writerFeatures": ["vacuumProtocolCheck", "icebergCompatV2"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="icebergCompatV2"):
        vacuum(t)


def test_add_constraint_on_v7_table_lists_feature(spark, tmp_path):
    """ALTER TABLE ADD CONSTRAINT on a table-features (v7) protocol must
    LIST checkConstraints in writerFeatures — the version number alone
    carries no meaning there, so a bare metaData commit would let other
    engines write without enforcing the constraint."""
    from duck_delta_share_spark.sources.delta_log import add_check_constraint

    t = tmp_path / "c7"
    df = spark.createDataFrame([(0, "x", 1.0)], _DEFAULTS_SCHEMA)
    write_delta(df, t)  # defaults schema -> v7 allowColumnDefaults protocol
    assert snapshot(t).protocol["minWriterVersion"] == 7
    add_check_constraint(spark, t, "pos", "score >= 0")
    proto = snapshot(t).protocol
    assert proto["minWriterVersion"] == 7
    assert "checkConstraints" in proto["writerFeatures"]
    # the constraint enforces
    with pytest.raises(ValueError, match="CHECK constraint pos"):
        write_delta(
            spark.createDataFrame([(9, "y", -1.0)], _DEFAULTS_SCHEMA), t
        )
