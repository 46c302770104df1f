"""Writer-protocol gate: refuse writes to tables demanding unimplemented
writer features, and enforce delta.appendOnly (appends + OPTIMIZE legal,
rewrites rejected)."""

from __future__ import annotations

import json

import pytest

from duck_delta_share_spark.sources.delta_log import (
    _atomic_commit,
    delete_where,
    latest_version,
    merge_delta,
    optimize,
    read_delta,
    restore_delta,
    snapshot,
    write_delta,
)


def _df(spark, lo=0, hi=10):
    return spark.range(lo, hi).selectExpr("id", "CAST(id % 3 AS BIGINT) AS k")


def _set_config(table, extra_config=None, protocol=None):
    snap = snapshot(table)
    actions = []
    if protocol:
        actions.append({"protocol": protocol})
    config = dict(snap.configuration)
    config.update(extra_config or {})
    actions.append(
        {
            "metaData": {
                "id": "test",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": snap.schema_string,
                "partitionColumns": list(snap.partition_columns),
                "configuration": config,
            }
        }
    )
    _atomic_commit(table, snap.version + 1, actions, operation="SET TBLPROPERTIES")


def test_unknown_writer_feature_rejected(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark), t)
    _set_config(
        t,
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["icebergCompatV2"],
        },
    )
    for op in (
        lambda: write_delta(_df(spark, 10, 12), t),
        lambda: merge_delta(spark, t, _df(spark, 0, 2), ["id"]),
        lambda: delete_where(spark, t, "id > 5"),
        lambda: optimize(spark, t),
        lambda: restore_delta(t, 0),
    ):
        with pytest.raises(ValueError, match="icebergCompatV2"):
            op()
    # reads are unaffected (icebergCompatV2 is writer-only)
    assert read_delta(spark, t).count() == 10


def test_future_writer_version_rejected(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark), t)
    _set_config(t, protocol={"minReaderVersion": 1, "minWriterVersion": 8})
    with pytest.raises(ValueError, match="minWriterVersion 8"):
        write_delta(_df(spark, 10, 12), t)


def test_known_writer_features_accepted(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark), t)
    _set_config(
        t,
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors", "appendOnly", "checkConstraints"],
        },
    )
    write_delta(_df(spark, 10, 12), t)
    assert read_delta(spark, t).count() == 12


def test_append_only_semantics(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark), t)
    _set_config(t, extra_config={"delta.appendOnly": "true"})
    write_delta(_df(spark, 10, 15), t)  # appends stay legal
    with pytest.raises(ValueError, match="append-only"):
        write_delta(_df(spark), t, mode="overwrite")
    with pytest.raises(ValueError, match="append-only"):
        delete_where(spark, t, "id = 1")
    with pytest.raises(ValueError, match="append-only"):
        merge_delta(spark, t, _df(spark, 0, 1), ["id"])
    with pytest.raises(ValueError, match="append-only"):
        restore_delta(t, 0)
    # OPTIMIZE moves bytes with dataChange=false: allowed by the spec
    optimize(spark, t)
    assert read_delta(spark, t).count() == 15
