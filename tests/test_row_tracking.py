"""Row tracking (Delta protocol "Row Tracking" + "Domain Metadata"):
every add action on a table with delta.enableRowTracking=true carries
baseRowId / defaultRowCommitVersion; the rowIdHighWaterMark advances
through the delta.rowTracking metadata domain; reads materialize
_row_id = baseRowId + physical row index (stable under deletion-vector
deletes) and _row_commit_version.

The reference has no write path and ignores even deletion vectors
(delta_sharing_client.cpp:357-369); delta-spark semantics are the model."""

from __future__ import annotations

import json

import pytest

from duck_delta_share_spark.sources.delta_log import (
    checkpoint,
    delete_where,
    merge_delta,
    optimize,
    read_delta,
    restore_delta,
    snapshot,
    write_delta,
)

RT_CONF = {"delta.enableRowTracking": "true"}


def _watermark(t):
    raw = snapshot(t).domain_metadata.get("delta.rowTracking")
    return json.loads(raw)["rowIdHighWaterMark"] if raw else -1


def _make(spark, tmp_path, rows=10, parts=3):
    t = tmp_path / "t"
    df = spark.range(rows).selectExpr("id AS k", "id * 2 AS v").repartition(parts)
    write_delta(df, t, configuration=RT_CONF)
    return t


def test_create_assigns_base_row_ids(spark, tmp_path):
    t = _make(spark, tmp_path)
    snap = snapshot(t)
    assert snap.protocol["minWriterVersion"] == 7
    assert "rowTracking" in snap.protocol["writerFeatures"]
    assert "domainMetadata" in snap.protocol["writerFeatures"]
    bases = []
    for f in snap.files:
        assert f["baseRowId"] is not None
        assert f["defaultRowCommitVersion"] == 0
        n = json.loads(f["stats"])["numRecords"]
        bases.append((f["baseRowId"], n))
    # ranges are disjoint and dense over [0, rows)
    covered = sorted(
        i for base, n in bases for i in range(base, base + n)
    )
    assert covered == list(range(10))
    assert _watermark(t) == 9


def test_read_materializes_row_ids(spark, tmp_path):
    t = _make(spark, tmp_path)
    out = read_delta(spark, t, with_row_ids=True)
    rows = out.collect()
    assert {r._row_id for r in rows} == set(range(10))
    assert {r._row_commit_version for r in rows} == {0}
    # plain read is unchanged (no synthetic columns)
    assert "_row_id" not in read_delta(spark, t).columns


def test_second_append_continues_watermark(spark, tmp_path):
    t = _make(spark, tmp_path)
    write_delta(
        spark.range(10, 15).selectExpr("id AS k", "id * 2 AS v"), t
    )
    assert _watermark(t) == 14
    out = read_delta(spark, t, with_row_ids=True).collect()
    assert {r._row_id for r in out} == set(range(15))
    assert {r._row_commit_version for r in out} == {0, 1}


def test_row_ids_stable_under_dv_delete(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = {
        r.k: r._row_id
        for r in read_delta(spark, t, with_row_ids=True).collect()
    }
    delete_where(spark, t, "k % 3 = 0")
    after = {
        r.k: r._row_id
        for r in read_delta(spark, t, with_row_ids=True).collect()
    }
    assert set(after) == {k for k in range(10) if k % 3 != 0}
    for k, rid in after.items():
        assert rid == before[k]  # surviving rows keep their stable ids
    assert _watermark(t) == 9  # deletes allocate nothing


def test_checkpoint_preserves_row_tracking(spark, tmp_path):
    t = _make(spark, tmp_path)
    v = checkpoint(t)
    for n in range(v + 1):
        (t / "_delta_log" / f"{n:020d}.json").unlink()
    # watermark and per-file baseRowIds survive log truncation
    assert _watermark(t) == 9
    snap = snapshot(t)
    assert all(f["baseRowId"] is not None for f in snap.files)
    write_delta(spark.range(10, 12).selectExpr("id AS k", "id*2 AS v"), t)
    out = read_delta(spark, t, with_row_ids=True).collect()
    assert {r._row_id for r in out} == set(range(12))


def test_optimize_preserves_row_ids(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = {
        r.k: (r._row_id, r._row_commit_version)
        for r in read_delta(spark, t, with_row_ids=True).collect()
    }
    res = optimize(spark, t)
    assert res["files_after"] < res["files_before"]
    after = {
        r.k: (r._row_id, r._row_commit_version)
        for r in read_delta(spark, t, with_row_ids=True).collect()
    }
    # compaction PRESERVES logical row ids: the pre-rewrite ids were
    # materialized into the hidden physical columns and win the coalesce
    # over the compacted file's fresh baseRowId
    assert after == before
    # the compacted add still allocated fresh baseRowIds (mandatory), so
    # the watermark advanced even though logical ids did not change
    assert _watermark(t) == 19
    # a further delete on the compacted table keeps ids stable too
    delete_where(spark, t, "k >= 8")
    final = {
        r.k: r._row_id
        for r in read_delta(spark, t, with_row_ids=True).collect()
    }
    assert final == {k: before[k][0] for k in range(8)}


def test_merge_and_restore_row_ids(spark, tmp_path):
    t = _make(spark, tmp_path)
    merge_delta(
        spark,
        t,
        spark.createDataFrame([(3, 33), (77, 154)], "k long, v long"),
        ["k"],
    )
    out = {r.k: r._row_id for r in read_delta(spark, t, with_row_ids=True).collect()}
    assert set(out) == set(range(10)) | {77}
    assert len(set(out.values())) == len(out)  # all unique
    high_after_merge = _watermark(t)
    assert high_after_merge > 9
    # restore to the pre-merge version resurrects the ORIGINAL ids
    restore_delta(t, 0)
    back = {r.k: r._row_id for r in read_delta(spark, t, with_row_ids=True).collect()}
    assert set(back) == set(range(10))
    # watermark never regresses (ids stay unique across history)
    assert _watermark(t) == high_after_merge


def test_with_row_ids_rejects_untracked_table(spark, tmp_path):
    t = tmp_path / "plain"
    write_delta(spark.range(3).selectExpr("id AS k"), t)
    with pytest.raises(Exception, match="baseRowId"):
        read_delta(spark, t, with_row_ids=True).collect()
