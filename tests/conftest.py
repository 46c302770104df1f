from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from duck_delta_share_spark.session import get_spark

    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        # per-process warehouse: the suite sharder (below) runs several
        # pytest processes concurrently; saveAsTable tests must not share
        # cwd/spark-warehouse across them
        extra_conf={
            "spark.sql.warehouse.dir": f"/tmp/ddss_wh_{os.getpid()}"
        },
    )
    yield s
    s.stop()


# ---------------------------------------------------------------------------
# Suite sharder: the full suite outgrew the driver's verify budget
# (r12 VERIFY was cut at 42% of a 1:06 h run). pytest-xdist is not
# available in this environment, so full-directory runs are sharded at
# the FILE level across worker subprocesses; each worker streams exact
# per-phase outcomes which the parent re-emits as normal TestReports —
# the terminal summary, -x semantics and exit code are unchanged.
# Fail-safe: a test with no worker record (worker crashed/aborted) is
# reported FAILED, never silently green. Targeted runs (-k, -m, specific
# files, <24 files collected) and DDSS_SUITE_WORKERS<=1 stay serial.
# ---------------------------------------------------------------------------

_WORKER_ENV = "DDSS_SUITE_WORKER"
_REPORT_ENV = "DDSS_SUITE_REPORT"

# measured per-file wall seconds (r13 full run) — LPT scheduling hints
# only; unknown files are estimated from their test count. Staleness
# costs balance, never correctness.
_FILE_SECONDS = {
    "tests/test_oracle_fuzz_r7.py": 760.0,  # post-r13 pipelined compare
    "tests/test_restart_storm_r8.py": 367.0,
    "tests/test_multi_table_txn_r10.py": 257.0,
    "tests/test_streaming_fuzz_r8.py": 226.0,
    "tests/test_plan_hazard_sweep_r7.py": 202.0,
    "tests/test_crash_matrix_r9.py": 163.0,
    "tests/test_graph_pagerank_r11.py": 87.0,
    "tests/test_property_review_r5.py": 83.0,
    "tests/test_incremental_dedup_r10.py": 72.0,
    "tests/test_sessionize.py": 61.0,
    "tests/test_adversarial_inputs_r6s2.py": 60.0,
    "tests/test_incremental_dedup_property_r10.py": 58.0,
    "tests/test_occ_threads_r8.py": 47.0,
    "tests/test_ann_recall.py": 47.0,
    "tests/test_operator_review_r5.py": 41.0,
    "tests/test_streaming.py": 35.0,
    "tests/test_incremental.py": 34.0,
    "tests/test_ivfpq.py": 33.0,
    "tests/test_ivf_persisted_r10.py": 33.0,
    "tests/test_scd2_stream.py": 33.0,
    "tests/test_store_maintenance_r11.py": 28.0,
    "tests/test_datasource.py": 22.0,
    "tests/test_streaming_incremental_neardup_r11.py": 21.0,
    "tests/test_retention_paired_read_r12.py": 18.0,
    "tests/test_transitions_stream.py": 16.0,
}


def pytest_runtest_logreport(report):
    """Worker side: stream every phase outcome to the parent's record
    file. No-op outside a sharded worker."""
    path = os.environ.get(_REPORT_ENV)
    if not path:
        return
    reason = ""
    if report.outcome == "skipped" and isinstance(report.longrepr, tuple):
        reason = report.longrepr[2].replace("\t", " ").replace("\n", " ")
    with open(path, "a") as f:
        f.write(f"{report.when}\t{report.outcome}\t{report.nodeid}\t{reason}\n")


def _shard_files(per_file: dict, n: int) -> list[list[str]]:
    """Longest-processing-time partition of files into n buckets."""
    buckets = [[0.0, []] for _ in range(n)]
    for path, cost in sorted(per_file.items(), key=lambda kv: -kv[1]):
        b = min(buckets, key=lambda b: b[0])
        b[0] += cost
        b[1].append(path)
    return [b[1] for b in buckets if b[1]]


def pytest_runtestloop(session):
    if os.environ.get(_WORKER_ENV):
        return None  # inside a worker: run normally
    config = session.config
    opt = config.option
    if (
        getattr(opt, "collectonly", False)
        or getattr(opt, "keyword", "")
        or getattr(opt, "markexpr", "")
    ):
        return None
    try:
        n_workers = int(os.environ.get("DDSS_SUITE_WORKERS", "4"))
    except ValueError:
        n_workers = 4
    by_file: dict[str, list] = {}
    for it in session.items:
        by_file.setdefault(it.location[0], []).append(it)
    if n_workers <= 1 or len(by_file) < 24:
        return None  # targeted run: serial

    import subprocess
    import tempfile

    per_file = {
        f: _FILE_SECONDS.get(f, 5.0 + 1.5 * len(items))
        for f, items in by_file.items()
    }
    buckets = _shard_files(per_file, n_workers)
    tmp = Path(tempfile.mkdtemp(prefix="ddss_suite_shard_"))
    procs = []
    for k, bucket in enumerate(buckets):
        report_path = tmp / f"report_{k}.tsv"
        out_path = tmp / f"worker_{k}.out"
        env = dict(os.environ)
        env[_WORKER_ENV] = "1"
        env[_REPORT_ENV] = str(report_path)
        cmd = [
            sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
            f"--basetemp={tmp / f'bt{k}'}", *bucket,
        ]
        procs.append(
            (
                k,
                subprocess.Popen(
                    cmd,
                    cwd=str(config.rootpath),
                    env=env,
                    stdout=open(out_path, "w"),
                    stderr=subprocess.STDOUT,
                ),
                report_path,
                out_path,
            )
        )
    tr = config.pluginmanager.get_plugin("terminalreporter")
    records: dict[str, dict] = {}
    for k, p, report_path, out_path in procs:
        rc = p.wait()
        p.stdout.close()
        if rc not in (0,) and tr is not None:
            # surface the worker's real tracebacks in the parent output
            tr.write_line(
                f"\n--- suite worker {k} exited {rc}; its output: ---"
            )
            tr.write_line(out_path.read_text()[-20000:])
        if report_path.exists():
            for line in report_path.read_text().splitlines():
                when, outcome, nodeid, reason = (line.split("\t", 3) + [""])[:4]
                rec = records.setdefault(nodeid, {})
                rec[when] = outcome
                if outcome == "skipped" and reason:
                    rec["reason"] = reason

    from _pytest.reports import TestReport

    for it in session.items:
        rec = records.get(it.nodeid)
        if rec is None:
            rep = TestReport(
                nodeid=it.nodeid,
                location=it.location,
                keywords=dict(it.keywords),
                outcome="failed",
                longrepr=(
                    "test has no worker record — its shard worker "
                    "crashed or aborted before running it (see worker "
                    "output above)"
                ),
                when="call",
                sections=[],
            )
        elif any(v == "failed" for v in rec.values()):
            rep = TestReport(
                nodeid=it.nodeid,
                location=it.location,
                keywords=dict(it.keywords),
                outcome="failed",
                longrepr=(
                    "failed in shard worker (full traceback in the "
                    "worker output above)"
                ),
                when="call",
                sections=[],
            )
        elif any(v == "skipped" for v in rec.values()):
            rep = TestReport(
                nodeid=it.nodeid,
                location=it.location,
                keywords=dict(it.keywords),
                outcome="skipped",
                longrepr=(
                    it.location[0],
                    it.location[1] or 0,
                    rec.get("reason", "skipped in shard worker"),
                ),
                when="setup",
                sections=[],
            )
        else:
            rep = TestReport(
                nodeid=it.nodeid,
                location=it.location,
                keywords=dict(it.keywords),
                outcome="passed",
                longrepr=None,
                when="call",
                sections=[],
            )
        session.ihook.pytest_runtest_logreport(report=rep)
    return True
