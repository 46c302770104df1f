"""Deletion vectors: format roundtrips, merge-on-read DELETE, scan
filtering, time travel, checkpoint persistence, vacuum safety, and the
protocol gate for features we do NOT implement."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from duck_delta_share_spark.sources import deletion_vectors as dv
from duck_delta_share_spark.sources.delta_log import (
    checkpoint,
    delete_where,
    latest_version,
    read_delta,
    snapshot,
    vacuum,
    write_delta,
)


# ---------------------------------------------------------------------------
# Format units (no Spark)
# ---------------------------------------------------------------------------


def test_z85_roundtrip():
    for payload in (b"\x00" * 4, b"\xff" * 8, bytes(range(16)), b"abcd" * 10):
        assert dv.z85_decode(dv.z85_encode(payload)) == payload


def test_roaring_roundtrip_array_bitmap_and_buckets():
    rng = np.random.default_rng(7)
    cases = [
        [],
        [0],
        [5, 7, 9, 65535, 65536],
        list(rng.choice(1 << 17, size=9000, replace=False)),  # bitmap container
        [3, (1 << 32) + 5, (1 << 33) + 7],  # several 64-bit buckets
    ]
    for c in cases:
        got = dv.parse_dv(dv.serialize_dv(c))
        assert list(got) == sorted(set(int(x) for x in c))


def test_roaring_run_container_parse():
    # hand-built SERIAL_COOKIE (12347) bitmap with one run container:
    # values 10..19 — the reader must accept run-compressed DVs written
    # by other engines even though we never emit them
    buf = struct.pack("<I", (0 << 16) | 12347)
    buf += bytes([0b1])
    buf += struct.pack("<HH", 0, 9)
    buf += struct.pack("<H", 1) + struct.pack("<HH", 10, 9)
    vals, _ = dv._parse_rb32(buf, 0)
    assert list(vals) == list(range(10, 20))


def test_dv_file_and_inline_descriptor_roundtrip(tmp_path):
    idx = [3, 5, 1 << 35]
    desc = dv.write_dv_file(tmp_path, idx)
    assert desc["storageType"] == "u" and desc["cardinality"] == 3
    assert list(dv.load_dv(desc, tmp_path)) == idx
    inline = dv.inline_dv_descriptor([2, 4, 6])
    assert list(dv.load_dv(inline, "/nowhere")) == [2, 4, 6]


def test_u_storage_prefix_resolves(tmp_path):
    # delta-spark writes u-storage as <random prefix><z85 uuid>, the
    # prefix becoming a subdirectory — the resolver must honor it
    desc = dv.write_dv_file(tmp_path, [1, 9])
    encoded = desc["pathOrInlineDv"]
    (tmp_path / "ab").mkdir()
    src = dv._dv_file_path(desc, tmp_path)
    src.rename(tmp_path / "ab" / src.name)
    prefixed = dict(desc, pathOrInlineDv="ab/" + encoded)
    assert list(dv.load_dv(prefixed, tmp_path)) == [1, 9]


def test_load_dv_without_offset_defaults_past_version_byte(tmp_path):
    """Spec-legal descriptors may omit ``offset``; the payload still starts
    after the file's 1-byte format-version framing (ADVICE r3)."""
    desc = dv.write_dv_file(tmp_path, [4, 8, 1 << 40])
    no_offset = {k: v for k, v in desc.items() if k != "offset"}
    assert list(dv.load_dv(no_offset, tmp_path)) == [4, 8, 1 << 40]
    none_offset = dict(desc, offset=None)
    assert list(dv.load_dv(none_offset, tmp_path)) == [4, 8, 1 << 40]


def test_dv_checksum_guard(tmp_path):
    desc = dv.write_dv_file(tmp_path, [1, 2, 3])
    path = dv._dv_file_path(desc, tmp_path)
    raw = bytearray(path.read_bytes())
    raw[7] ^= 0xFF  # corrupt payload
    path.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="checksum|magic"):
        dv.load_dv(desc, tmp_path)


# ---------------------------------------------------------------------------
# End-to-end over local Delta
# ---------------------------------------------------------------------------


@pytest.fixture()
def numbers(spark):
    return spark.range(0, 100).selectExpr(
        "id", "id % 4 as grp", "cast(id * 1.5 as double) as val"
    )


def test_delete_where_masks_rows(spark, numbers, tmp_path):
    t = tmp_path / "t"
    write_delta(numbers.repartition(4), t)
    res = delete_where(spark, t, "id % 10 = 3")
    assert res["rows_deleted"] == 10 and res["files_touched"] >= 1
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == [i for i in range(100) if i % 10 != 3]
    # no data file was rewritten: adds reuse the original parquet paths
    snap = snapshot(t)
    assert all(f["deletionVector"] for f in snap.files if f["deletionVector"])


def test_delete_compose_and_time_travel(spark, numbers, tmp_path):
    t = tmp_path / "t"
    write_delta(numbers.repartition(2), t)
    v0 = latest_version(t)
    delete_where(spark, t, "id < 10")
    delete_where(spark, t, "id >= 90")  # second DV unions with the first
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == list(range(10, 90))
    # time travel reads the pre-delete snapshot (DVs are per-version state)
    assert read_delta(spark, t, version=v0).count() == 100
    mid = sorted(
        r.id for r in read_delta(spark, t, version=v0 + 1).collect()
    )
    assert mid == list(range(10, 100))


def test_delete_entire_file_drops_add(spark, tmp_path):
    t = tmp_path / "t"
    base = spark.range(0, 50).selectExpr("id", "cast(id >= 25 as int) as hi")
    write_delta(base.repartition("hi"), t)
    res = delete_where(spark, t, "hi = 1")
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == list(range(0, 25))
    snap = snapshot(t)
    # files whose every row died are bare-removed, not re-added with a DV
    for f in snap.files:
        card = (f.get("deletionVector") or {}).get("cardinality", 0)
        n = json.loads(f["stats"])["numRecords"]
        assert card < n


def test_delete_on_partition_column(spark, tmp_path):
    t = tmp_path / "p"
    df = spark.createDataFrame(
        [(1, "eu"), (2, "eu"), (3, "us"), (4, "us")], "id long, pcol string"
    )
    write_delta(df, t, partition_by=["pcol"])
    res = delete_where(spark, t, "pcol = 'us' and id = 3")
    assert res["rows_deleted"] == 1
    got = sorted((r.id, r.pcol) for r in read_delta(spark, t).collect())
    assert got == [(1, "eu"), (2, "eu"), (4, "us")]


def test_checkpoint_preserves_dvs(spark, numbers, tmp_path):
    t = tmp_path / "t"
    write_delta(numbers.repartition(2), t)
    delete_where(spark, t, "id % 3 = 0")
    checkpoint(t)
    # remove replayed commits: snapshot must come from the checkpoint alone
    for p in (t / "_delta_log").glob("*.json"):
        p.unlink()
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == [i for i in range(100) if i % 3 != 0]


def test_checkpoint_dvs_survive_table_move(spark, numbers, tmp_path):
    """Checkpoint add rows must keep the table-relative 'u' descriptor,
    not the driver-resolved absolute 'p' path — after checkpoint + log
    truncation, a moved/renamed table directory must still load its DVs
    (ADVICE r3)."""
    import pyarrow.parquet as pq

    t = tmp_path / "orig"
    write_delta(numbers.repartition(2), t)
    delete_where(spark, t, "id % 5 = 1")
    v = checkpoint(t)
    # the persisted descriptors stay in original log form
    cp = pq.read_table(t / "_delta_log" / f"{v:020d}.checkpoint.parquet")
    descs = [
        r["add"]["deletionVector"]
        for r in cp.to_pylist()
        if r.get("add") and r["add"].get("path")
    ]
    assert any(d and d.get("storageType") == "u" for d in descs)
    assert not any(
        d and d.get("storageType") == "p" and str(tmp_path) in d["pathOrInlineDv"]
        for d in descs
    )
    for p in (t / "_delta_log").glob("*.json"):
        p.unlink()
    moved = tmp_path / "moved"
    t.rename(moved)
    got = sorted(r.id for r in read_delta(spark, moved).collect())
    assert got == [i for i in range(100) if i % 5 != 1]


def test_vacuum_keeps_live_dv_files(spark, numbers, tmp_path):
    t = tmp_path / "t"
    write_delta(numbers.coalesce(1), t)
    delete_where(spark, t, "id = 7")
    stale = delete_where(spark, t, "id = 8")  # supersedes the first DV file
    vacuum(t, retain_hours=0.0)
    # live DV still loads; table still reads correctly post-vacuum
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == [i for i in range(100) if i not in (7, 8)]
    bins = list(t.glob("deletion_vector_*.bin"))
    assert len(bins) == 1, "orphaned DV file should be vacuumed"


def test_optimize_compacts_away_dvs(spark, numbers, tmp_path):
    """OPTIMIZE reads through the DV masks (shared scan path) and rewrites
    survivors into fresh files with no deletion vectors — merge-on-read
    debt is paid down by compaction, logical rows unchanged."""
    from duck_delta_share_spark.sources.delta_log import optimize

    t = tmp_path / "t"
    write_delta(numbers.repartition(4), t)
    delete_where(spark, t, "id % 7 = 0")
    optimize(spark, t)
    snap = snapshot(t)
    assert all(not f.get("deletionVector") for f in snap.files)
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == [i for i in range(100) if i % 7 != 0]


def test_cdf_over_dv_delete(spark, numbers, tmp_path):
    """A DV delete commit replays through the change feed with remove
    masked by the OLD deletion vector and add masked by the NEW one: the
    killed rows net out as deletes with no re-insert, survivors churn as
    delete+insert pairs (same attribution style as overwrite/merge)."""
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    t = tmp_path / "t"
    write_delta(numbers.coalesce(1), t)
    delete_where(spark, t, "id % 5 = 0")
    spark.dataSource.register(DeltaShareDataSource)
    cdf = (
        spark.read.format("deltashare")
        .option("deltaPath", str(t))
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
    )
    rows = cdf.collect()
    deletes = {r.id for r in rows if r._change_type == "delete"}
    inserts = {r.id for r in rows if r._change_type == "insert"}
    killed = {i for i in range(100) if i % 5 == 0}
    assert killed <= deletes
    assert killed.isdisjoint(inserts)
    assert inserts == set(range(100)) - killed


def test_delete_commit_carries_commit_info(spark, numbers, tmp_path):
    t = tmp_path / "t"
    write_delta(numbers.coalesce(1), t)
    delete_where(spark, t, "id = 1")
    lines = [
        json.loads(line)
        for line in (t / "_delta_log" / f"{1:020d}.json").read_text().splitlines()
        if line.strip()
    ]
    ci = lines[0].get("commitInfo")
    assert ci and ci["operation"] == "DELETE" and ci["timestamp"] > 0


def test_unsupported_reader_feature_fails_fast(spark, numbers, tmp_path):
    t = tmp_path / "t"
    write_delta(numbers.coalesce(1), t)
    log = t / "_delta_log"
    v = latest_version(t) + 1
    (log / f"{v:020d}.json").write_text(
        json.dumps(
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["variantType", "deletionVectors"],
                }
            }
        )
        + "\n"
    )
    with pytest.raises(Exception, match="variantType"):
        read_delta(spark, t).collect()
