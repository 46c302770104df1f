"""Live-thread OCC stress (r8): the existing OCC tests inject SEQUENCED
races via a monkeypatched _atomic_commit; here real threads hammer one
table concurrently, so collisions land at arbitrary points in the
snapshot→plan→commit pipeline instead of the one injected seam.

Invariants checked after the dust settles:
- pure appends from N threads all land EXACTLY once (no lost batch, no
  double-apply), the log is a contiguous linear version chain, and
  in-commit-ish commitInfo timestamps never regress;
- merges racing disjoint appends either rebase-and-succeed or abort
  with the documented ConcurrentWriteError — whatever SUCCEEDED is
  fully visible (no silent lost update).
"""

from __future__ import annotations

import json
import threading

from duck_delta_share_spark.sources.delta_log import (
    merge_delta,
    read_delta,
    write_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


def test_threaded_pure_appends_land_exactly_once(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark, [(-1, 0.0)]), t)  # v0
    n_threads, per = 4, 5
    errors: list[Exception] = []

    def worker(tid: int):
        try:
            for s in range(per):
                # distinct keys per (thread, seq): content proves
                # exactly-once landing
                base = 1000 * tid + 10 * s
                write_delta(
                    _df(spark, [(base, float(tid)), (base + 1, float(s))]),
                    t,
                    mode="append",
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(300)
    assert not errors, errors

    # every batch landed exactly once
    rows = {(r.id, r.v) for r in read_delta(spark, t).collect()}
    want = {(-1, 0.0)}
    for tid in range(n_threads):
        for s in range(per):
            base = 1000 * tid + 10 * s
            want |= {(base, float(tid)), (base + 1, float(s))}
    assert rows == want

    # the log is a CONTIGUOUS linear chain: v0 + one commit per batch
    log = t / "_delta_log"
    versions = sorted(
        int(p.stem) for p in log.glob("*.json") if p.stem.isdigit()
    )
    assert versions == list(range(n_threads * per + 1))

    # commitInfo timestamps never regress (the +1 clamp holds under
    # real concurrency, not just sequenced injections)
    stamps = []
    for v in versions:
        with open(log / f"{v:020d}.json") as f:
            first = json.loads(f.readline())
        info = first.get("commitInfo", {})
        stamps.append(int(info.get("inCommitTimestamp") or info.get("timestamp", 0)))
    assert all(b > a for a, b in zip(stamps, stamps[1:])), stamps


def test_threaded_merge_races_disjoint_appends(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(_df(spark, [(i, 0.0) for i in range(50)]), t)  # v0
    merge_errors: list[Exception] = []
    merges_done = []

    def appender():
        for s in range(6):
            base = 10_000 + 10 * s  # disjoint from every merge key
            write_delta(_df(spark, [(base, 1.0)]), t, mode="append")

    def merger():
        # merge keys 0..49 (upserts on the v0 rows) — disjoint from the
        # appender's 10k+ keys, so the documented behavior is
        # rebase-and-succeed; an abort would be a ConcurrentWriteError
        # (allowed by the protocol, but the DISJOINT rule says rebase)
        for s in range(4):
            try:
                res = merge_delta(
                    spark, t, _df(spark, [(s, float(s + 1))]), ["id"]
                )
                merges_done.append((s, res["version"]))
            except Exception as e:
                merge_errors.append(e)

    ta = threading.Thread(target=appender)
    tb = threading.Thread(target=merger)
    ta.start()
    tb.start()
    ta.join(300)
    tb.join(300)

    # disjoint-key merges rebase over concurrent appends — none abort
    assert not merge_errors, merge_errors
    rows = {(r.id, r.v) for r in read_delta(spark, t).collect()}
    # every append visible
    for s in range(6):
        assert (10_000 + 10 * s, 1.0) in rows
    # every merge's upsert visible (merge s sets id=s -> v=s+1)
    for s in range(4):
        assert (s, float(s + 1)) in rows
    # untouched v0 rows intact — no lost update from any rebase
    for i in range(4, 50):
        assert (i, 0.0) in rows
    assert len(rows) == 50 + 6
