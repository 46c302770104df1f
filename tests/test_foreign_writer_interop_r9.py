"""Foreign-writer interop lens (r9): logs written by OTHER engines use
action shapes that are exotic but LEGAL per the Delta protocol — this
repo's writer never emits them, so the reader path was only
fixture-verified against its own output. Each case must read correctly
(same rows) or gate loudly; never misparse.

Covered shapes:
- add.path URL-encoded (space/percent in the file name) — the spec
  stores RFC 2396 URL-encoded relative paths;
- a commit with NO commitInfo action (commitInfo is optional);
- add with NO stats / NO size / NO modificationTime (all optional) —
  scans work, pruning just degrades, checkpointing still round-trips;
- UNKNOWN extra fields inside known actions (forward compat: readers
  must ignore fields they don't know);
- remove WITHOUT deletionTimestamp (optional) — vacuum falls back to
  the mtime clock instead of crashing;
- actions in unusual order (remove first, metaData last) — replay is
  order-insensitive within a commit for disjoint paths;
- partitionValues as the spec's STRING map on a partitioned table —
  pruning and value re-attachment still typed correctly.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from duck_delta_share_spark.sources.delta_log import (
    checkpoint,
    read_delta,
    snapshot,
    vacuum,
    write_delta,
)

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_parquet(table: Path, rel: str, ids):
    p = table / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, "int64"), "v": [f"r{i}" for i in ids]}),
        p,
    )
    return p


def _foreign_log(table: Path, commits: list[list[dict]]):
    log = table / "_delta_log"
    log.mkdir(parents=True, exist_ok=True)
    for v, actions in enumerate(commits):
        (log / f"{v:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions) + "\n"
        )


def test_url_encoded_paths_no_commitinfo_no_stats(spark, tmp_path):
    t = tmp_path / "t"
    _write_parquet(t, "part one %x.parquet", [1, 2])
    _write_parquet(t, "plain.parquet", [3])
    _foreign_log(
        t,
        [
            [
                # remove FIRST, metaData LAST: order-insensitive replay
                {"remove": {"path": "never-existed.parquet"}},
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                {
                    "add": {
                        # URL-encoded: 'part one %x.parquet'
                        "path": "part%20one%20%25x.parquet",
                        "partitionValues": {},
                        "dataChange": True,
                        # NO stats / size / modificationTime
                        "someFutureAddField": {"ignored": True},
                    }
                },
                {
                    "add": {
                        "path": "plain.parquet",
                        "partitionValues": {},
                        "dataChange": True,
                    }
                },
                {
                    "metaData": {
                        "id": "foreign-meta-1",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": SCHEMA_JSON,
                        "partitionColumns": [],
                        # NO configuration key at all (old writers)
                        "unknownMetaField": 7,
                    }
                },
            ]
        ],
    )
    got = sorted((r.id, r.v) for r in read_delta(spark, t).collect())
    assert got == [(1, "r1"), (2, "r2"), (3, "r3")]
    # checkpointing a foreign log round-trips (optional fields stay None)
    cp = checkpoint(t)
    assert cp == 0
    got2 = sorted((r.id, r.v) for r in read_delta(spark, t).collect())
    assert got2 == got


def test_remove_without_deletion_timestamp_vacuums_by_mtime(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame(
            [(i, "a") for i in range(5)], "id long, v string"
        ).coalesce(1),
        t,
    )
    files = snapshot(t).files
    assert len(files) == 1, "seed must be a single file for the swap"
    old_rel = files[0]["url"]
    _write_parquet(t, "replacement.parquet", [100])
    # foreign commit: swap the file, remove WITHOUT deletionTimestamp
    log = t / "_delta_log"
    rel = str(Path(old_rel).relative_to(t))
    (log / f"{1:020d}.json").write_text(
        json.dumps({"remove": {"path": rel, "dataChange": True}})
        + "\n"
        + json.dumps(
            {
                "add": {
                    "path": "replacement.parquet",
                    "partitionValues": {},
                    "dataChange": True,
                }
            }
        )
        + "\n"
    )
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [100]
    # no tombstone clock for the removed file: vacuum must use mtime —
    # fresh file survives zero-retention... then age it and it goes
    assert vacuum(t, retain_hours=168.0)["files_removed"] == 0
    import os

    old = time.time() - 400 * 3600
    os.utime(old_rel, (old, old))
    assert vacuum(t, retain_hours=168.0)["files_removed"] >= 1
    assert not Path(old_rel).exists()
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [100]


def test_foreign_partitioned_string_values_prune_and_type(spark, tmp_path):
    t = tmp_path / "t"
    # partition column k (long) lives in the DIRECTORY/partitionValues,
    # not the file — the spec's string map must re-type on read
    _write_parquet(t, "k=1/a.parquet", [1, 2])
    _write_parquet(t, "k=2/b.parquet", [3])
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            ],
        }
    )
    _foreign_log(
        t,
        [
            [
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                {
                    "metaData": {
                        "id": "foreign-meta-2",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema,
                        "partitionColumns": ["k"],
                        "configuration": {},
                    }
                },
                {
                    "add": {
                        "path": "k=1/a.parquet",
                        "partitionValues": {"k": "1"},
                        "dataChange": True,
                    }
                },
                {
                    "add": {
                        "path": "k=2/b.parquet",
                        "partitionValues": {"k": "2"},
                        "dataChange": True,
                    }
                },
            ]
        ],
    )
    df = read_delta(spark, t)
    assert dict(df.dtypes)["k"] == "bigint", "partition value must re-type"
    got = sorted((r.id, r.k) for r in df.collect())
    assert got == [(1, 1), (2, 1), (3, 2)]
    # partition pruning on the string-map value still works end-to-end
    only2 = df.where("k = 2").collect()
    assert sorted(r.id for r in only2) == [3]
