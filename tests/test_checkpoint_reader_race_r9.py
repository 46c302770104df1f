"""Checkpoint-WRITE-vs-reader race lens (r9, the last untried candidate).

A maintainer runs checkpoint() + log truncation (delete commits <= N and
superseded checkpoints) while readers list-and-replay the same log.
Single-part checkpoint writes are atomic renames, so a reader either sees
the checkpoint or not — the REAL races live between the reader's listing
and its reads:

1. listing saw commits only -> maintainer checkpoints + truncates ->
   replay opens a vanished commit. Silent skip would drop that commit's
   actions; a raw FileNotFoundError is a spurious failure (the new
   checkpoint has everything). snapshot() must RETRY from a fresh listing.
2. listing saw a (now superseded) checkpoint -> it vanishes mid-read ->
   fallback needs commits the truncation deleted. Same cure: re-list.
3. truly-truncated PINNED versions must keep failing loud (missing
   commits), never return partial state.
4. checkpoint() racing live appends / another checkpoint() must only ever
   produce checkpoints that exactly describe their version.

Plus the live-thread stress: appender + maintainer + snapshot-hammering
readers on one table, with a per-read exact-state invariant.
"""

from __future__ import annotations

import threading

import pytest

from duck_delta_share_spark.sources import delta_log
from duck_delta_share_spark.sources.delta_log import (
    ConcurrentLogTruncation,
    checkpoint,
    read_delta,
    snapshot,
    write_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


def _build(spark, path, n_commits):
    for i in range(n_commits):
        write_delta(_df(spark, [(i, float(i))]), path, mode="append")


def _truncate(log, upto, drop_checkpoints_below=None):
    for f in log.glob("*.json"):
        if f.name[:20].isdigit() and int(f.name[:20]) <= upto:
            f.unlink()
    if drop_checkpoints_below is not None:
        for f in log.glob("*.checkpoint*.parquet"):
            if int(f.name[:20]) < drop_checkpoints_below:
                f.unlink()


def test_commit_vanishing_mid_replay_retries_to_new_checkpoint(
    spark, tmp_path, monkeypatch
):
    t = tmp_path / "t"
    _build(spark, t, 10)
    log = t / "_delta_log"

    # the reader's FIRST listing predates the checkpoint: commits only
    stale = delta_log._list_versions(log)
    assert stale == (list(range(10)), [])

    cp = checkpoint(t)
    assert cp == 9
    _truncate(log, upto=cp)  # commits 0..9 gone; only the checkpoint left

    calls = {"n": 0}
    real = delta_log._list_versions

    def stale_then_real(p):
        calls["n"] += 1
        return stale if calls["n"] == 1 else real(p)

    monkeypatch.setattr(delta_log, "_list_versions", stale_then_real)
    snap = snapshot(t)
    assert calls["n"] >= 2, "snapshot never re-listed after the vanished commit"
    assert snap.version == 9
    assert len(snap.files) == 10
    rows = {(r.id, r.v) for r in read_delta(spark, t).collect()}
    assert rows == {(i, float(i)) for i in range(10)}


def test_superseded_checkpoint_vanishing_mid_read_retries(
    spark, tmp_path, monkeypatch
):
    t = tmp_path / "t"
    _build(spark, t, 6)
    cp1 = checkpoint(t)  # checkpoint @5
    _build_more = [(10, 10.0)]
    write_delta(_df(spark, _build_more), t, mode="append")  # v6
    log = t / "_delta_log"

    # reader's listing: checkpoint@5 + commit 6 (commits 0..5 truncated)
    _truncate(log, upto=cp1)
    stale = delta_log._list_versions(log)
    assert stale[1] == [5]

    # maintainer: new checkpoint @6, then drop the superseded @5
    cp2 = checkpoint(t)
    assert cp2 == 6
    _truncate(log, upto=cp2, drop_checkpoints_below=cp2)

    calls = {"n": 0}
    real = delta_log._list_versions

    def stale_then_real(p):
        calls["n"] += 1
        return stale if calls["n"] == 1 else real(p)

    monkeypatch.setattr(delta_log, "_list_versions", stale_then_real)
    snap = snapshot(t)
    assert calls["n"] >= 2
    assert snap.version == 6
    assert len(snap.files) == 7


def test_truly_truncated_pinned_version_fails_loud(spark, tmp_path):
    t = tmp_path / "t"
    _build(spark, t, 10)
    cp = checkpoint(t)
    _truncate(t / "_delta_log", upto=cp)
    # version 3 needs commits 0..3 (or a checkpoint <= 3): all gone.
    with pytest.raises(ValueError, match="missing commit"):
        snapshot(t, version=3)
    # latest still reads fine from the checkpoint
    assert snapshot(t).version == 9


def test_persistent_race_error_carries_context(spark, tmp_path, monkeypatch):
    """If every re-listing keeps racing (pathological), the error that
    escapes is the actionable ConcurrentLogTruncation, not a bare
    FileNotFoundError with no table/version context."""
    t = tmp_path / "t"
    _build(spark, t, 4)
    log = t / "_delta_log"
    stale = delta_log._list_versions(log)
    checkpoint(t)
    _truncate(log, upto=3)
    monkeypatch.setattr(delta_log, "_list_versions", lambda p: stale)
    with pytest.raises(ConcurrentLogTruncation, match=r"commit 0 of .*vanished"):
        snapshot(t)


def test_truncation_error_is_not_a_missing_table():
    """last_txn_version maps FileNotFoundError (table absent) to -1; a
    truncation race must NOT take that branch — returning -1 there would
    let an idempotent sink double-apply a batch."""
    assert issubclass(ConcurrentLogTruncation, OSError)
    assert not issubclass(ConcurrentLogTruncation, FileNotFoundError)


def test_concurrent_checkpoints_same_version_both_valid(spark, tmp_path):
    t = tmp_path / "t"
    _build(spark, t, 5)
    errors: list[Exception] = []

    def worker():
        try:
            checkpoint(t)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(120)
    assert not errors, errors
    _truncate(t / "_delta_log", upto=4)
    snap = snapshot(t)
    assert snap.version == 4 and len(snap.files) == 5


def test_live_threads_checkpoint_truncate_vs_readers(spark, tmp_path):
    """Appender + maintainer (checkpoint + truncate) + 2 snapshot-hammering
    readers. Invariant per successful read: a snapshot at version v holds
    exactly v+1 files (every commit adds exactly one 1-row file) — any
    torn mix of checkpoint state and commit replay breaks it. Readers must
    never observe an exception: the bounded retry absorbs the races."""
    t = tmp_path / "t"
    write_delta(_df(spark, [(0, 0.0)]), t)  # v0
    stop = threading.Event()
    errors: list[str] = []
    n_appends = 24

    def appender():
        try:
            for i in range(1, n_appends + 1):
                write_delta(_df(spark, [(i, float(i))]), t, mode="append")
        except Exception as e:
            errors.append(f"appender: {e!r}")
        finally:
            stop.set()

    def maintainer():
        log = t / "_delta_log"
        while not stop.is_set():
            try:
                cp = checkpoint(t)
                _truncate(log, upto=cp, drop_checkpoints_below=cp)
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(f"maintainer: {e!r}")
                return

    def reader(tag):
        seen = 0
        while not stop.is_set() or seen == 0:
            try:
                snap = snapshot(t)
            except Exception as e:
                errors.append(f"reader {tag}: {e!r}")
                return
            if len(snap.files) != snap.version + 1:
                errors.append(
                    f"reader {tag}: TORN state v{snap.version} with "
                    f"{len(snap.files)} files"
                )
                return
            seen += 1

    threads = [
        threading.Thread(target=appender),
        threading.Thread(target=maintainer),
        threading.Thread(target=reader, args=(1,)),
        threading.Thread(target=reader, args=(2,)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(300)
    assert not errors, errors

    # final state: every append visible exactly once through the scan path
    rows = {(r.id, r.v) for r in read_delta(spark, t).collect()}
    assert rows == {(i, float(i)) for i in range(n_appends + 1)}


def test_checkpoint_racing_appends_describes_one_version(spark, tmp_path):
    """checkpoint() concurrent with live appends: whatever version N each
    produced checkpoint claims, reading THAT checkpoint alone must equal
    the commit-replayed state at N (never a mix with in-flight writes)."""
    t = tmp_path / "t"
    write_delta(_df(spark, [(0, 0.0)]), t)
    errors: list[Exception] = []
    made: list[int] = []

    def appender():
        try:
            for i in range(1, 13):
                write_delta(_df(spark, [(i, float(i))]), t, mode="append")
        except Exception as e:
            errors.append(e)

    def checkpointer():
        try:
            for _ in range(6):
                made.append(checkpoint(t))
        except Exception as e:
            errors.append(e)

    ths = [threading.Thread(target=appender), threading.Thread(target=checkpointer)]
    for th in ths:
        th.start()
    for th in ths:
        th.join(300)
    assert not errors, errors

    log = t / "_delta_log"
    for v in sorted(set(made)):
        cp_file = log / f"{v:020d}.checkpoint.parquet"
        assert cp_file.exists()
        state = {
            "schema_string": "",
            "partition_columns": (),
            "files": {},
            "protocol": None,
            "configuration": {},
            "transactions": {},
            "domain_metadata": {},
        }
        delta_log._read_checkpoint(cp_file, state, t)
        # exactly v+1 one-row files: the checkpoint is a pure function of
        # version v, untouched by the appends racing past it
        assert len(state["files"]) == v + 1, (v, len(state["files"]))


# --- sibling list-then-read paths (self-review finding: the lens's
# "reader never fails spuriously under maintenance" guarantee must hold
# for every reader, not just snapshot()) -------------------------------


def _stale_listing(monkeypatch, log, then_real=True):
    """First _list_versions call returns the CURRENT listing captured
    now; later calls (after the caller truncates the log) see reality."""
    stale = delta_log._list_versions(log)
    calls = {"n": 0}
    real = delta_log._list_versions

    def fn(p):
        calls["n"] += 1
        return stale if calls["n"] == 1 or not then_real else real(p)

    monkeypatch.setattr(delta_log, "_list_versions", fn)
    return calls


def test_describe_history_skips_vanished_commits(spark, tmp_path, monkeypatch):
    t = tmp_path / "t"
    _build(spark, t, 6)
    log = t / "_delta_log"
    calls = _stale_listing(monkeypatch, log)
    cp = checkpoint(t)
    _truncate(log, upto=cp - 1)  # keep only the latest commit
    hist = delta_log.describe_history(t)
    assert calls["n"] >= 1
    # vanished commits have no history rows (same as already-truncated);
    # the retained one is still reported, and nothing raised
    assert [h["version"] for h in hist] == [5]
    assert hist[0]["operation"] is not None


def test_metadata_actions_tolerates_vanishing_commit(spark, tmp_path):
    t = tmp_path / "t"
    _build(spark, t, 4)
    log = t / "_delta_log"
    checkpoint(t)
    _truncate(log, upto=2)  # versions 0..2 vanish under a reader's range
    # documented skip semantics: absent commits contribute nothing
    out = delta_log.metadata_actions(t, 0, 3)
    assert all(v == 3 or v > 2 for v, _ in out) or out == []


def test_version_changes_vanished_commit_is_documented_error(
    spark, tmp_path
):
    t = tmp_path / "t"
    _build(spark, t, 4)
    log = t / "_delta_log"
    cp = checkpoint(t)
    _truncate(log, upto=cp)
    with pytest.raises(ValueError, match="log truncated.*fresh snapshot"):
        delta_log.version_changes(t, 0, 3)


def test_version_at_timestamp_relists_on_vanished_commit(
    spark, tmp_path, monkeypatch
):
    t = tmp_path / "t"
    _build(spark, t, 6)
    log = t / "_delta_log"
    calls = _stale_listing(monkeypatch, log)
    cp = checkpoint(t)
    _truncate(log, upto=cp - 1)
    # resolution must re-list after hitting the vanished commit, then
    # resolve from what is actually retained (commit 5 + checkpoint)
    far_future = 4102444800000  # 2100-01-01 in epoch ms
    v = delta_log.version_at_timestamp(t, far_future)
    assert calls["n"] >= 2
    assert v == 5
