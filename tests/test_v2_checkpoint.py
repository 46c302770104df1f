"""V2 checkpoint reads: `N.checkpoint.<uuid>.parquet` manifests with
sidecar file actions (protocol "V2 Checkpoints") replay correctly, with
and without log truncation, and the v2Checkpoint reader feature passes
the protocol gate."""

from __future__ import annotations

import json
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from duck_delta_share_spark.sources.delta_log import (
    read_delta,
    snapshot,
    write_delta,
)


def _to_v2_checkpoint(spark, t, version):
    """Convert the table state at `version` into a hand-built v2
    checkpoint: manifest (protocol + metaData + checkpointMetadata +
    sidecar refs) + two sidecar parquet files holding the add actions."""
    snap = snapshot(t, version)
    log = t / "_delta_log"
    (log / "_sidecars").mkdir()

    def add_row(f):
        return {
            "add": {
                "path": str(
                    __import__("pathlib").Path(f["url"]).relative_to(t)
                ),
                "partitionValues": f["partitionValues"] or {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": False,
                "stats": f["stats"],
            }
        }

    add_struct = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ]
    )
    files = list(snap.files)
    halves = [files[: len(files) // 2], files[len(files) // 2:]]
    sidecar_names = []
    for half in halves:
        name = f"{uuid.uuid4()}.parquet"
        sidecar_names.append(name)
        rows = [add_row(f) for f in half]
        pq.write_table(
            pa.Table.from_pylist(rows, schema=pa.schema([("add", add_struct)])),
            log / "_sidecars" / name,
        )

    manifest_rows = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["v2Checkpoint"],
                "writerFeatures": ["v2Checkpoint"],
            }
        },
        {
            "metaData": {
                "id": "v2-test",
                "format": {"provider": "parquet"},
                "schemaString": snap.schema_string,
                "partitionColumns": list(snap.partition_columns),
                "configuration": {},
            }
        },
        {"checkpointMetadata": {"version": version}},
    ] + [
        {"sidecar": {"path": n, "sizeInBytes": 1, "modificationTime": 0}}
        for n in sidecar_names
    ]
    schema = pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string())])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", pa.map_(pa.string(), pa.string())),
                    ]
                ),
            ),
            ("checkpointMetadata", pa.struct([("version", pa.int64())])),
            (
                "sidecar",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("sizeInBytes", pa.int64()),
                        ("modificationTime", pa.int64()),
                    ]
                ),
            ),
            ("add", add_struct),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(manifest_rows, schema=schema),
        log / f"{version:020d}.checkpoint.{uuid.uuid4()}.parquet",
    )
    (log / "_last_checkpoint").write_text(
        json.dumps({"version": version, "size": len(files)})
    )


def test_v2_checkpoint_replay_and_truncation(spark, tmp_path):
    t = tmp_path / "t"
    df = spark.range(0, 40).selectExpr("id", "CAST(id % 5 AS BIGINT) AS k")
    write_delta(df.repartition(4), t)
    write_delta(spark.range(40, 50).selectExpr("id", "CAST(id % 5 AS BIGINT) AS k"), t)
    _to_v2_checkpoint(spark, t, 1)
    # replay THROUGH the v2 checkpoint
    assert read_delta(spark, t).count() == 50
    # truncate the json commits: sidecar state must fully reconstruct
    for c in (t / "_delta_log").glob("*.json"):
        c.unlink()
    snap = snapshot(t)
    assert snap.version == 1
    assert read_delta(spark, t).count() == 50
    assert snap.protocol["readerFeatures"] == ["v2Checkpoint"]
    # commits after the checkpoint still apply
    write_delta(spark.range(50, 52).selectExpr("id", "CAST(id % 5 AS BIGINT) AS k"), t)
    assert read_delta(spark, t).count() == 52


def test_v2_checkpoint_write_roundtrip(spark, tmp_path):
    """A table signaling the v2Checkpoint writer feature gets v2-format
    checkpoints from checkpoint() (uuid manifest + checkpointMetadata),
    and they replay after truncation."""
    from duck_delta_share_spark.sources.delta_log import (
        _atomic_commit,
        checkpoint,
    )

    t = tmp_path / "w"
    write_delta(spark.range(0, 30).selectExpr("id"), t)
    snap0 = snapshot(t)
    _atomic_commit(
        t,
        1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["v2Checkpoint"],
                    "writerFeatures": ["v2Checkpoint"],
                }
            }
        ],
        operation="UPGRADE",
    )
    write_delta(spark.range(30, 35).selectExpr("id"), t)
    v = checkpoint(t)
    assert v == 2
    manifests = list((t / "_delta_log").glob("*.checkpoint.*.parquet"))
    assert len(manifests) == 1
    assert len(manifests[0].name[:-8].split(".")) == 3  # uuid form
    for c in (t / "_delta_log").glob("*.json"):
        c.unlink()
    assert read_delta(spark, t).count() == 35
    write_delta(spark.range(35, 36).selectExpr("id"), t)
    assert read_delta(spark, t).count() == 36
