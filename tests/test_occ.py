"""Optimistic-concurrency conflict detection: disjoint blind appends
rebase and commit; overlapping appends, double-deletes, and metadata
drift abort with ConcurrentWriteError."""

from __future__ import annotations

import pytest

from duck_delta_share_spark.sources import delta_log as dl
from duck_delta_share_spark.sources.delta_log import (
    ConcurrentWriteError,
    merge_delta,
    read_delta,
    snapshot,
    write_delta,
)


def _df(spark, lo, hi, k=None):
    d = spark.range(lo, hi).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    return d


def test_merge_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    t = tmp_path / "t"
    write_delta(_df(spark, 0, 100), t)

    # inject a concurrent DISJOINT append (keys 1000+) between merge's
    # snapshot and its commit
    real = dl._atomic_commit
    fired = {"done": False}

    def racing(table, version, actions, operation=None, **kw):
        if operation == "MERGE" and not fired["done"]:
            fired["done"] = True
            write_delta(_df(spark, 1000, 1010), t)  # takes our version
        return real(table, version, actions, operation, **kw)

    monkeypatch.setattr(dl, "_atomic_commit", racing)
    res = merge_delta(spark, t, _df(spark, 5, 7), ["id"])
    # merge lost the O_EXCL race but rebased: both writes survive
    assert res["version"] == 2  # concurrent append took v1, merge rebased to v2
    assert read_delta(spark, t).count() == 110


def test_merge_aborts_on_overlapping_append(spark, tmp_path, monkeypatch):
    t = tmp_path / "t"
    write_delta(_df(spark, 0, 100), t)
    real = dl._atomic_commit
    fired = {"done": False}

    def racing(table, version, actions, operation=None, **kw):
        if operation == "MERGE" and not fired["done"]:
            fired["done"] = True
            write_delta(_df(spark, 5, 7), t)  # same key range as the merge
        return real(table, version, actions, operation, **kw)

    monkeypatch.setattr(dl, "_atomic_commit", racing)
    with pytest.raises(ConcurrentWriteError, match="appended rows"):
        merge_delta(spark, t, _df(spark, 5, 7), ["id"])


def test_delete_aborts_on_any_concurrent_append(spark, tmp_path, monkeypatch):
    t = tmp_path / "t"
    write_delta(_df(spark, 0, 100), t)
    real = dl._atomic_commit
    fired = {"done": False}

    def racing(table, version, actions, operation=None, **kw):
        if operation == "DELETE" and not fired["done"]:
            fired["done"] = True
            write_delta(_df(spark, 1000, 1002), t)
        return real(table, version, actions, operation, **kw)

    monkeypatch.setattr(dl, "_atomic_commit", racing)
    with pytest.raises(ConcurrentWriteError, match="appended rows"):
        dl.delete_where(spark, t, "id < 10")


def test_optimize_rebases_over_append(spark, tmp_path, monkeypatch):
    t = tmp_path / "t"
    write_delta(_df(spark, 0, 50).repartition(4), t)
    write_delta(_df(spark, 50, 100).repartition(4), t)
    real = dl._atomic_commit
    fired = {"done": False}

    def racing(table, version, actions, operation=None, **kw):
        if operation == "OPTIMIZE" and not fired["done"]:
            fired["done"] = True
            write_delta(_df(spark, 1000, 1005), t)
        return real(table, version, actions, operation, **kw)

    monkeypatch.setattr(dl, "_atomic_commit", racing)
    res = dl.optimize(spark, t)
    assert res["version"] == 3  # concurrent append took v2, optimize rebased to v3
    assert read_delta(spark, t).count() == 105


def test_conflict_check_unit(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark, 0, 10), t)
    v0 = snapshot(t).version
    write_delta(_df(spark, 10, 20), t)  # version 1, a blind append

    # disjoint append (add_conflicts False) commits at the next free slot
    v = dl._commit_with_conflict_check(
        t, v0, [{"commitInfo": {"operation": "X"}}], "X", set(), lambda a: False
    )
    assert v == 2

    # a stats-overlapping add conflicts
    with pytest.raises(ConcurrentWriteError):
        dl._commit_with_conflict_check(
            t, v0, [], "X", set(), lambda a: True
        )

    # a concurrent remove of a path we also remove conflicts
    removed_rel = [
        str(p.relative_to(t))
        for p in t.glob("*.parquet")
    ]
    dl._atomic_commit(
        t, 3, [{"remove": {"path": removed_rel[0], "dataChange": True}}], "DELETE"
    )
    with pytest.raises(ConcurrentWriteError, match="also"):
        dl._commit_with_conflict_check(
            t, v0, [], "X", {removed_rel[0]}, lambda a: False
        )
