"""Systematic crash matrix over the write path's filesystem mutations.

Earlier crash lenses (test_write_path_crash_r6, restart storm, OCC) kill
hand-picked seams. This matrix is exhaustive at the Python mutation layer:
count every filesystem MUTATION a write makes (shutil.move of staged data
files, the commit tmp's os.link/os.unlink, checkpoint os.replace,
multi-part Path.rename), then re-run the operation crashing at mutation
k for EVERY k. After each injected crash, two invariants:

1. NEVER TORN: a fresh read returns exactly the pre-write state or the
   fully-applied post-write state — no intermediate, no error. (Staged
   or moved-but-uncommitted data files are invisible: only the log
   defines the table. Orphans are vacuum's documented job.)
2. EXACTLY-ONCE RECOVERY: the real idempotent-writer discipline
   (SetTransaction + last_txn_version gate) re-applies the batch iff the
   crash lost it — the final state holds the batch exactly once for
   every crash point, including crashes BETWEEN the commit landing and
   the writer observing success.

Simulation layer: crashes are raised between mutations (kill -9 at op
boundaries). Torn CONTENT inside a single file is the corrupt-bytes /
corrupt-log lenses' territory; rename/link atomicity is the OS contract.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import pytest

from duck_delta_share_spark.sources.delta_log import (
    checkpoint,
    last_txn_version,
    read_delta,
    snapshot,
    write_delta,
)


class SimulatedCrash(BaseException):
    """BaseException so no library except-Exception handler can swallow
    the injected kill between two filesystem operations."""


class _FsFault:
    """Counts Python-side filesystem mutations; optionally crashes on the
    k-th one. Wraps the exact call forms the write path uses."""

    def __init__(self, monkeypatch, crash_at: int | None):
        self.n = 0
        self.crash_at = crash_at
        self._mp = monkeypatch
        monkeypatch.setattr(shutil, "move", self._wrap(shutil.move))
        monkeypatch.setattr(os, "link", self._wrap(os.link))
        monkeypatch.setattr(os, "replace", self._wrap(os.replace))
        monkeypatch.setattr(os, "unlink", self._wrap(os.unlink))
        # Path.rename patched as the unbound function: p.rename(t) calls
        # inner(p, t) and the original passes through unchanged
        monkeypatch.setattr(Path, "rename", self._wrap(Path.rename))

    def _wrap(self, fn):
        def inner(*a, **kw):
            self.n += 1
            if self.crash_at is not None and self.n == self.crash_at:
                raise SimulatedCrash(f"injected crash at fs mutation {self.n}")
            return fn(*a, **kw)

        return inner


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


BASE = [(0, 0.0), (1, 1.0)]
BATCH = [(10, 10.0), (11, 11.0)]


def _rows(spark, t):
    return {(r.id, r.v) for r in read_delta(spark, t).collect()}


def _count_ops(spark, tmp_path, monkeypatch, op) -> int:
    """Dry run with counting-only wrappers."""
    t = tmp_path / "count"
    write_delta(_df(spark, BASE), t)
    with pytest.MonkeyPatch.context() as mp:
        fault = _FsFault(mp, crash_at=None)
        op(spark, t)
    assert fault.n >= 2, "write path no longer routes through the wrapped ops"
    return fault.n


def _append_op(spark, t):
    write_delta(_df(spark, BATCH), t, mode="append", txn=("matrix", 7))


def test_append_crash_matrix(spark, tmp_path, monkeypatch):
    n_ops = _count_ops(spark, tmp_path, monkeypatch, _append_op)
    base_rows = set(BASE)
    want = base_rows | set(BATCH)
    for k in range(1, n_ops + 1):
        t = tmp_path / f"k{k}"
        write_delta(_df(spark, BASE), t)
        crashed = False
        with pytest.MonkeyPatch.context() as mp:
            _FsFault(mp, crash_at=k)
            try:
                _append_op(spark, t)
            except SimulatedCrash:
                crashed = True
        assert crashed, f"k={k}: matrix no longer reaches this op count"

        # invariant 1: never torn — old state or new state, nothing else
        seen = _rows(spark, t)
        assert seen in (base_rows, want), f"k={k}: torn state {sorted(seen)}"

        # invariant 2: the idempotent-writer recovery protocol converges
        # to exactly-once regardless of where the crash landed
        if last_txn_version(t, "matrix") < 7:
            _append_op(spark, t)
        assert _rows(spark, t) == want, f"k={k}: recovery not exactly-once"
        assert last_txn_version(t, "matrix") == 7


def test_overwrite_crash_matrix(spark, tmp_path, monkeypatch):
    def op(spark, t):
        write_delta(_df(spark, BATCH), t, mode="overwrite", txn=("ow", 3))

    n_ops = _count_ops(spark, tmp_path, monkeypatch, op)
    base_rows = set(BASE)
    want = set(BATCH)
    for k in range(1, n_ops + 1):
        t = tmp_path / f"k{k}"
        write_delta(_df(spark, BASE), t)
        with pytest.MonkeyPatch.context() as mp:
            _FsFault(mp, crash_at=k)
            with pytest.raises(SimulatedCrash):
                op(spark, t)
        seen = _rows(spark, t)
        assert seen in (base_rows, want), f"k={k}: torn state {sorted(seen)}"
        if last_txn_version(t, "ow") < 3:
            op(spark, t)
        assert _rows(spark, t) == want, f"k={k}: recovery not exactly-once"


@pytest.mark.parametrize("parts", [None, 2], ids=["single", "multipart"])
def test_checkpoint_crash_matrix(spark, tmp_path, monkeypatch, parts):
    """A crash at ANY mutation of checkpoint() must leave a fully
    readable table (checkpoints are pure redundancy), and a retried
    checkpoint must land and survive log truncation."""

    def op(spark, t):
        checkpoint(t, max_actions_per_part=parts)

    # count on a table with enough versions for >1 part
    t0 = tmp_path / "count"
    write_delta(_df(spark, BASE), t0)
    write_delta(_df(spark, BATCH), t0, mode="append")
    with pytest.MonkeyPatch.context() as mp:
        fault = _FsFault(mp, crash_at=None)
        op(spark, t0)
    n_ops = fault.n
    assert n_ops >= 2

    want = set(BASE) | set(BATCH)
    for k in range(1, n_ops + 1):
        t = tmp_path / f"{parts}k{k}"
        write_delta(_df(spark, BASE), t)
        write_delta(_df(spark, BATCH), t, mode="append")
        with pytest.MonkeyPatch.context() as mp:
            _FsFault(mp, crash_at=k)
            with pytest.raises(SimulatedCrash):
                op(spark, t)
        # reads never degrade: commits still replay around any torn
        # checkpoint artifacts
        assert _rows(spark, t) == want, f"k={k}: read degraded after crash"
        # retry lands; then truncate commits and prove the checkpoint
        # alone carries the state
        v = checkpoint(t, max_actions_per_part=parts)
        for f in (t / "_delta_log").glob("*.json"):
            if int(f.name[:20]) <= v:
                f.unlink()
        assert _rows(spark, t) == want, f"k={k}: checkpoint not self-sufficient"
        assert snapshot(t).version == v
