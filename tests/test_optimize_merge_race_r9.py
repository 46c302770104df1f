"""OPTIMIZE-vs-MERGE live-thread OCC race (r9) — the pairing the r8
thread lens (append-vs-merge) left uncovered: compaction REWRITES files
a concurrent merge also rewrites, so the two operations' remove sets
genuinely collide (unlike disjoint appends).

Invariants after real threads hammer one table:
- the only surfaced failure mode is ConcurrentWriteError (retryable);
- the final row state is EXACTLY the semantic fold of the operations
  that reported success — every succeeded merge's update/insert visible
  (no lost update under compaction), every append exactly once;
- optimize commits carry dataChange=false adds and never change the
  row multiset;
- the log is a contiguous linear version chain.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path

from duck_delta_share_spark.sources.delta_log import (
    ConcurrentWriteError,
    merge_delta,
    optimize,
    read_delta,
    write_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


def test_optimize_vs_merge_vs_append_threads(spark, tmp_path):
    t = tmp_path / "t"
    # several seed files so optimize always has something to compact
    for chunk in range(4):
        write_delta(
            _df(spark, [(chunk * 50 + i, 0.0) for i in range(50)]),
            t,
            mode="append",
        )

    errors: list[Exception] = []
    merge_ok: list[int] = []  # seq numbers of merges that SUCCEEDED
    optimize_ok: list[dict] = []
    occ_aborts: list[str] = []
    lock = threading.Lock()

    def optimizer():
        try:
            for _ in range(6):
                try:
                    out = optimize(spark, t, target_file_mb=64)
                    with lock:
                        optimize_ok.append(out)
                except ConcurrentWriteError as e:
                    with lock:
                        occ_aborts.append(f"optimize: {e}")
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    def merger():
        try:
            for s in range(5):
                # each merge updates ONE distinct seed row and inserts
                # ONE distinct new row — success bookkeeping gives the
                # exact expected final state
                upd = _df(spark, [(s * 10, 100.0 + s), (1000 + s, 100.0 + s)])
                for _attempt in range(8):
                    try:
                        merge_delta(spark, t, upd, ["id"])
                        with lock:
                            merge_ok.append(s)
                        break
                    except ConcurrentWriteError as e:
                        with lock:
                            occ_aborts.append(f"merge {s}: {e}")
                # a merge that exhausted retries simply isn't in merge_ok
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def appender():
        try:
            for s in range(5):
                write_delta(
                    _df(spark, [(2000 + s, -1.0)]), t, mode="append"
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=optimizer),
        threading.Thread(target=merger),
        threading.Thread(target=appender),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(600)
    assert not errors, errors

    # final state == semantic fold of the SUCCEEDED operations
    got = {r.id: r.v for r in read_delta(spark, t).collect()}
    want = {i: 0.0 for i in range(200)}
    for s in range(5):
        want[2000 + s] = -1.0  # appends never abort (disjoint blind)
    for s in merge_ok:
        want[s * 10] = 100.0 + s
        want[1000 + s] = 100.0 + s
    assert got == want

    # log hygiene: contiguous chain; optimize commits are dataChange=false
    log = Path(t) / "_delta_log"
    versions = sorted(
        int(p.stem) for p in log.glob("*.json") if p.stem.isdigit()
    )
    assert versions == list(range(len(versions)))
    n_opt_commits = 0
    for v in versions:
        ops, adds_dc = None, []
        for line in (log / f"{v:020d}.json").read_text().splitlines():
            if not line.strip():
                continue
            a = json.loads(line)
            if "commitInfo" in a:
                ops = a["commitInfo"].get("operation")
            if "add" in a:
                adds_dc.append(a["add"].get("dataChange", True))
        if ops == "OPTIMIZE":
            n_opt_commits += 1
            assert adds_dc and not any(adds_dc), (
                f"optimize commit {v} must add with dataChange=false"
            )
    # no-op optimizes (nothing worth compacting) return the snapshot
    # version WITHOUT committing — only real compactions write a commit
    real_compactions = [
        o for o in optimize_ok if o["files_after"] < o["files_before"]
    ]
    assert n_opt_commits == len(real_compactions), (optimize_ok, n_opt_commits)
    # at least one real collision should have occurred across 6 optimize
    # rounds x 5 contended merges; if the box serialized everything the
    # lens still verified the fold — just note it
    assert merge_ok, "no merge ever succeeded — retry budget too small?"


def test_optimize_loses_to_committed_merge_on_shared_file(spark, tmp_path):
    """Deterministic single-collision version of the race: optimize plans
    against a snapshot, a merge rewrites one of the planned files and
    COMMITS first — optimize must abort with ConcurrentWriteError, never
    resurrect the file's pre-merge rows."""
    from duck_delta_share_spark.sources import delta_log as dl

    t = tmp_path / "t"
    for chunk in range(2):
        write_delta(
            _df(spark, [(chunk * 10 + i, 0.0) for i in range(10)]),
            t,
            mode="append",
        )

    real_commit = dl._commit_with_conflict_check
    state = {"merged": False}

    def inject(table, read_version, actions, operation, *a, **kw):
        # first optimize commit attempt: sneak the merge in ahead of it
        if operation == "OPTIMIZE" and not state["merged"]:
            state["merged"] = True
            merge_delta(spark, t, _df(spark, [(5, 99.0)]), ["id"])
        return real_commit(table, read_version, actions, operation, *a, **kw)

    import pytest

    dl._commit_with_conflict_check = inject
    try:
        with pytest.raises(ConcurrentWriteError, match="re-read and retry"):
            optimize(spark, t, target_file_mb=64)
    finally:
        dl._commit_with_conflict_check = real_commit

    got = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert got[5] == 99.0, "aborted optimize must not resurrect old rows"
    assert len(got) == 20
