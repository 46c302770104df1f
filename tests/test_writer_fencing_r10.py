"""Zombie / fenced-writer lens (r10): two writers claiming the same
SetTransaction appId.

The protocol facts this pins (Delta "Transaction Identifiers"; the
reference has no write path at all):

1. RACE window: two writers committing the same (appId, version)
   concurrently — the OCC loop's same-appId conflict check makes the
   loser fail LOUD ("this batch may already be applied"), never a blind
   retry that double-applies (sources/delta_log.py write_delta).
2. The idempotent-writer DISCIPLINE (gate on last_txn_version before
   writing, as incremental_dedup_commit does) yields exactly-once under
   any interleaving: the late writer either skips at the gate or loses
   the race loudly.
3. A gate-LESS stale write REGRESSES the marker (replay keeps the LAST
   txn per appId in commit order — protocol semantics, same as
   delta-spark). This is exactly why the gate is mandatory; the test
   pins the engine behavior so a future "helpful" in-engine guard that
   silently drops stale txns (diverging from the protocol) fails here.
"""

from __future__ import annotations

import threading

import pytest

from duck_delta_share_spark.sources.delta_log import (
    last_txn_version,
    read_delta,
    write_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


BASE = [(0, 0.0)]
BATCH = [(10, 10.0), (11, 11.0)]


def test_same_batch_race_exactly_once_or_loud(spark, tmp_path):
    """Hammer the (appId, version) race: across trials, with the real
    writer discipline, the batch lands exactly once; a losing racer is
    LOUD, never silent double-apply."""
    for trial in range(6):
        t = tmp_path / f"trial{trial}"
        write_delta(_df(spark, BASE), t)
        barrier = threading.Barrier(2)
        outcomes: list[str] = []
        lock = threading.Lock()

        def writer(name):
            barrier.wait()
            try:
                if last_txn_version(t, "app") < 7:
                    write_delta(_df(spark, BATCH), t, mode="append", txn=("app", 7))
                    out = "applied"
                else:
                    out = "skipped"
            except RuntimeError as e:
                assert "already be applied" in str(e) or "metadata" in str(e), e
                out = "loud-loser"
            with lock:
                outcomes.append(out)

        threads = [
            threading.Thread(target=writer, args=(n,)) for n in ("a", "b")
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()

        applied = outcomes.count("applied")
        rows = sorted((r.id, r.v) for r in read_delta(spark, t).collect())
        assert applied >= 1, f"trial {trial}: nobody applied ({outcomes})"
        assert rows == sorted(BASE + BATCH), (
            f"trial {trial}: batch applied {applied}x ({outcomes}): {rows}"
        )
        assert last_txn_version(t, "app") == 7


def test_stale_zombie_skips_at_the_gate(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark, BASE), t)
    write_delta(_df(spark, BATCH), t, mode="append", txn=("app", 5))
    # the zombie woke up with stale state wanting to write batch 4
    assert last_txn_version(t, "app") == 5  # the gate the zombie MUST check
    if last_txn_version(t, "app") < 4:
        raise AssertionError("unreachable: the gate blocks the stale batch")
    rows = sorted(r.id for r in read_delta(spark, t).collect())
    assert rows == [0, 10, 11]


def test_gateless_stale_write_regresses_marker_by_protocol(spark, tmp_path):
    """Protocol pin: without the gate, a stale (appId, 4) commit AFTER
    (appId, 5) regresses the visible marker to 4 — replay keeps the LAST
    txn per appId in commit order (Delta spec; delta-spark identical).
    The engine must NOT silently drop it: the gate belongs to the
    writer, and an in-engine 'fix' would diverge from every other
    reader of the same log."""
    t = tmp_path / "t"
    write_delta(_df(spark, BASE), t)
    write_delta(_df(spark, BATCH), t, mode="append", txn=("app", 5))
    write_delta(_df(spark, [(20, 20.0)]), t, mode="append", txn=("app", 4))
    assert last_txn_version(t, "app") == 4
