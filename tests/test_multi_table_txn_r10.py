"""Multi-table transactional consistency lens (r10).

Two Delta tables maintained by ONE pipeline (corpus + fingerprint store,
rollup + audit log, ...) have independent logs — there is no atomic
cross-table commit, so a naive reader taking two head snapshots can see a
HALF-APPLIED batch. The repo's protocol:

- WRITER: every batch commits the primary first, then the secondary, both
  carrying the same SetTransaction (app_id, batch) marker
  (operators/dedup.py incremental_dedup_commit).
- READER: sources/delta_log.py paired_snapshot_versions — take the
  secondary HEAD (the lagging table), read its marker w, binary-search
  the primary for the latest version still carrying w. The result is a
  consistent pair for EVERY interleaving, or a LOUD error (writer-order
  violation, log truncated past the pin) — never a silent mix.

Coverage: mid-flight pinning, seed-only pinning, loud secondary-ahead,
loud truncation-past-pin, a crash MATRIX at every fs mutation of the
two-table ingest (paired reads consistent at every crash point), and a
live writer-vs-reader thread race over the real incremental-dedup
pipeline.
"""

from __future__ import annotations

import os
import shutil
import threading
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from duck_delta_share_spark.functions.text import fingerprint
from duck_delta_share_spark.operators.dedup import (
    exact_dedup,
    incremental_dedup_commit,
)
from duck_delta_share_spark.sources.delta_log import (
    checkpoint,
    paired_snapshot_versions,
    read_delta,
    write_delta,
)


class SimulatedCrash(BaseException):
    pass


class _FsFault:
    def __init__(self, monkeypatch, crash_at: int | None):
        self.n = 0
        self.crash_at = crash_at
        monkeypatch.setattr(shutil, "move", self._wrap(shutil.move))
        monkeypatch.setattr(os, "link", self._wrap(os.link))
        monkeypatch.setattr(os, "replace", self._wrap(os.replace))
        monkeypatch.setattr(os, "unlink", self._wrap(os.unlink))
        monkeypatch.setattr(Path, "rename", self._wrap(Path.rename))

    def _wrap(self, fn):
        def inner(*a, **kw):
            self.n += 1
            if self.crash_at is not None and self.n == self.crash_at:
                raise SimulatedCrash(f"injected crash at fs mutation {self.n}")
            return fn(*a, **kw)

        return inner


SCHEMA = "doc_id long, lang string, source string, text string"
HISTORY = [
    (1, "en", "web", "the quick brown fox"),
    (2, "en", "web", "jumps over the lazy dog"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _shard(i: int):
    # shard i: one fresh doc + one exact dup of history doc 1
    return [
        (100 + i, "en", "crawl", f"fresh text of shard {i}"),
        (200 + i, "en", "web", "THE quick  brown fox"),
    ]


def _seed(spark, base: Path):
    corpus, store = base / "corpus", base / "fps"
    seed = exact_dedup(_docs(spark, HISTORY), "text", "doc_id")
    write_delta(seed, corpus)
    write_delta(seed.select(fingerprint("text").alias("fp"), "doc_id"), store)
    return corpus, store


def _paired_fps_equal(spark, corpus, store):
    """The paired invariant: at the pinned pair of versions, the store's
    fingerprints are EXACTLY the corpus docs' fingerprints."""
    pv, sv = paired_snapshot_versions(corpus, store, "loader")
    corpus_fps = {
        r.fp
        for r in read_delta(spark, corpus, version=pv)
        .select(fingerprint("text").alias("fp"))
        .collect()
    }
    store_fps = {r.fp for r in read_delta(spark, store, version=sv).collect()}
    return corpus_fps, store_fps, (pv, sv)


def test_paired_read_pins_primary_at_lagging_marker(spark, tmp_path):
    corpus, store = _seed(spark, tmp_path)
    incremental_dedup_commit(spark, _docs(spark, _shard(1)), corpus, store, "loader", 1)
    # batch 2 half-applied: primary (corpus) committed, secondary not yet
    write_delta(
        _docs(spark, [(300, "en", "crawl", "half applied doc")]),
        corpus,
        txn=("loader", 2),
    )
    a, b, (pv, sv) = _paired_fps_equal(spark, corpus, store)
    assert a == b, "paired read exposed the half-applied batch"
    # the pin must be the batch-1 corpus version, not the head
    ids = {r.doc_id for r in read_delta(spark, corpus, version=pv).collect()}
    assert 300 not in ids and 101 in ids
    # once batch 2's secondary commit lands, the pair advances
    write_delta(
        spark.createDataFrame([("zz", 300)], "fp string, doc_id long"),
        store,
        txn=("loader", 2),
    )
    pv2, _ = paired_snapshot_versions(corpus, store, "loader")
    ids2 = {r.doc_id for r in read_delta(spark, corpus, version=pv2).collect()}
    assert 300 in ids2


def test_paired_read_seed_only(spark, tmp_path):
    """No batch ever ran (marker -1 on both): pin at the seed heads."""
    corpus, store = _seed(spark, tmp_path)
    a, b, (pv, sv) = _paired_fps_equal(spark, corpus, store)
    assert a == b and pv == 0 and sv == 0


def test_secondary_ahead_fails_loud(spark, tmp_path):
    corpus, store = _seed(spark, tmp_path)
    # writer bug: secondary committed batch 1 but primary never did
    write_delta(
        spark.createDataFrame([("aa", 900)], "fp string, doc_id long"),
        store,
        txn=("loader", 1),
    )
    with pytest.raises(ValueError, match="AHEAD of every primary version"):
        paired_snapshot_versions(corpus, store, "loader")


def test_truncation_past_pin_fails_loud(spark, tmp_path):
    corpus, store = _seed(spark, tmp_path)
    incremental_dedup_commit(spark, _docs(spark, _shard(1)), corpus, store, "loader", 1)
    # primary advances to batch 3 while secondary stays at 1
    for b in (2, 3):
        write_delta(
            _docs(spark, [(300 + b, "en", "crawl", f"doc {b}")]),
            corpus,
            txn=("loader", b),
        )
    # checkpoint the primary head and truncate every older commit: the
    # batch-1 pin target is gone from the retained log
    checkpoint(corpus)
    log = Path(corpus) / "_delta_log"
    kept = max(int(p.stem) for p in log.glob("*.json"))
    for p in log.glob("*.json"):
        if int(p.stem) < kept:
            p.unlink()
    for p in log.glob("*.checkpoint*.parquet"):
        if int(p.name.split(".")[0]) < kept:
            p.unlink()
    with pytest.raises(ValueError, match="truncated past the pinned state"):
        paired_snapshot_versions(corpus, store, "loader")


def test_crash_matrix_paired_reads_never_mixed(spark, tmp_path, monkeypatch):
    """At EVERY fs-mutation crash point of the two-table ingest, a paired
    read returns a fully-consistent pair — pre-batch or post-batch for
    the primary pin, with store fps exactly matching pinned corpus fps —
    and the replayed ingest restores head-level equality."""
    c0, s0 = _seed(spark, tmp_path / "count")
    with pytest.MonkeyPatch.context() as mp:
        fault = _FsFault(mp, crash_at=None)
        incremental_dedup_commit(
            spark, _docs(spark, _shard(1)), c0, s0, "loader", 1
        )
    n_ops = fault.n
    assert n_ops >= 4

    for k in range(1, n_ops + 1):
        base = tmp_path / f"k{k}"
        corpus, store = _seed(spark, base)
        with pytest.MonkeyPatch.context() as mp:
            _FsFault(mp, crash_at=k)
            with pytest.raises(SimulatedCrash):
                incremental_dedup_commit(
                    spark, _docs(spark, _shard(1)), corpus, store, "loader", 1
                )
        a, b, _ = _paired_fps_equal(spark, corpus, store)
        assert a == b, f"k={k}: paired read exposed a half-applied batch"

        incremental_dedup_commit(
            spark, _docs(spark, _shard(1)), corpus, store, "loader", 1
        )
        a, b, (pv, sv) = _paired_fps_equal(spark, corpus, store)
        assert a == b, f"k={k}: post-replay paired read inconsistent"
        ids = {r.doc_id for r in read_delta(spark, corpus, version=pv).collect()}
        assert ids == {1, 2, 101}, f"k={k}: replay lost/duplicated the batch"


def test_live_writer_reader_race(spark, tmp_path):
    """A writer thread ingests shards 1..6 through the real pipeline
    while a reader thread hammers paired reads: EVERY read must be
    consistent (store fps == pinned corpus fps) and pins must never move
    backwards."""
    corpus, store = _seed(spark, tmp_path)
    stop = threading.Event()
    failures: list[str] = []
    pins: list[tuple[int, int]] = []

    def reader():
        while not stop.is_set():
            try:
                a, b, pin = _paired_fps_equal(spark, corpus, store)
            except Exception as e:  # noqa: BLE001 — collected for the assert
                failures.append(f"reader error: {type(e).__name__}: {e}")
                return
            if a != b:
                failures.append(f"inconsistent pair at pin {pin}")
                return
            pins.append(pin)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for i in range(1, 7):
            incremental_dedup_commit(
                spark, _docs(spark, _shard(i)), corpus, store, "loader", i
            )
    finally:
        stop.set()
        t.join()
    assert not failures, failures
    assert pins, "reader never completed a paired read"
    # monotone pins: a later read never observes an earlier pair
    for (p1, s1), (p2, s2) in zip(pins, pins[1:]):
        assert p2 >= p1 and s2 >= s1, f"pin moved backwards: {(p1,s1)}->{(p2,s2)}"
    # final read sees all six shards' fresh docs exactly once
    pv, _ = paired_snapshot_versions(corpus, store, "loader")
    ids = sorted(
        r.doc_id for r in read_delta(spark, corpus, version=pv).collect()
    )
    assert ids == [1, 2] + [100 + i for i in range(1, 7)]


def test_paired_read_survives_optimize_and_vacuum(spark, tmp_path):
    """Maintenance robustness: the pin is the LATEST primary version
    still carrying the secondary's marker, so an OPTIMIZE after batch 1
    (txn unchanged) moves the pin onto the REWRITTEN files — vacuuming
    the superseded originals can never break a paired read. (Log
    truncation past the pin is the only loud case, proven above.)"""
    from duck_delta_share_spark.sources.delta_log import optimize, vacuum
    from tests.vacuum_util import (
        age_files,
        age_tombstones,
        refresh_current_files,
    )

    corpus, store = _seed(spark, tmp_path)
    incremental_dedup_commit(spark, _docs(spark, _shard(1)), corpus, store, "loader", 1)
    # fragment the corpus enough for optimize to act, WITHOUT txn markers
    write_delta(
        _docs(spark, [(301, "en", "crawl", "maintenance filler one")]),
        corpus,
        txn=None,
    )
    optimize(spark, corpus)
    # half-applied batch 2 so the pin must stay at marker 1
    write_delta(
        _docs(spark, [(302, "en", "crawl", "half applied two")]),
        corpus,
        txn=("loader", 2),
    )
    age_files(corpus)
    from duck_delta_share_spark.sources.delta_log import snapshot as _snap

    for v in range(_snap(corpus).version + 1):
        age_tombstones(corpus, [v])
    refresh_current_files(corpus, _snap)
    vacuum(corpus, retain_hours=0.0)

    pv, sv = paired_snapshot_versions(corpus, store, "loader")
    ids = {r.doc_id for r in read_delta(spark, corpus, version=pv).collect()}
    assert 302 not in ids and 101 in ids  # marker-1 state incl. maintenance
    a, b, _ = _paired_fps_equal(spark, corpus, store)
    # store lags the filler row's fp by design (it bypassed the pipeline);
    # the PAIRED invariant here is pipeline-doc consistency
    assert b <= a


def test_paired_reads_race_log_maintenance(spark, tmp_path):
    """A maintainer thread checkpoints + truncates the primary's log
    while a reader loops paired reads and a writer advances batches:
    every read must either return a consistent pair or fail with the
    LOUD truncation/retention error — never a silent mix, never a
    spurious error class."""
    import time

    from duck_delta_share_spark.sources.delta_log import checkpoint

    corpus, store = _seed(spark, tmp_path)
    incremental_dedup_commit(spark, _docs(spark, _shard(1)), corpus, store, "loader", 1)
    stop = threading.Event()
    failures: list[str] = []

    def maintainer():
        log = Path(corpus) / "_delta_log"
        while not stop.is_set():
            try:
                checkpoint(corpus)
                kept = max(int(p.stem) for p in log.glob("*.json"))
                # retain the last two commits: the pin target usually
                # survives, but the race can outrun it — that case must
                # surface as the loud ValueError, which the reader allows
                for p in list(log.glob("*.json")):
                    if int(p.stem) < kept - 1:
                        p.unlink()
            except Exception as e:  # noqa: BLE001
                failures.append(f"maintainer: {type(e).__name__}: {e}")
                return
            time.sleep(0.02)

    def reader():
        while not stop.is_set():
            try:
                a, b, _ = _paired_fps_equal(spark, corpus, store)
            except ValueError as e:
                if "truncated past the pinned state" in str(
                    e
                ) or "AHEAD of every primary" in str(e):
                    continue  # the documented loud outcome
                failures.append(f"reader wrong error: {e}")
                return
            except Exception as e:  # noqa: BLE001
                if type(e).__name__ == "ConcurrentLogTruncation":
                    continue  # snapshot()'s own documented loud outcome
                failures.append(f"reader error: {type(e).__name__}: {e}")
                return
            if a != b:
                failures.append("inconsistent pair under maintenance race")
                return

    threads = [threading.Thread(target=maintainer), threading.Thread(target=reader)]
    for t in threads:
        t.start()
    try:
        for i in range(2, 6):
            incremental_dedup_commit(
                spark, _docs(spark, _shard(i)), corpus, store, "loader", i
            )
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not failures, failures
    # final state: all five shards' fresh docs exactly once, pair equal
    a, b, (pv, _) = _paired_fps_equal(spark, corpus, store)
    assert a == b
    ids = sorted(r.doc_id for r in read_delta(spark, corpus, version=pv).collect())
    assert ids == [1, 2] + [100 + i for i in range(1, 6)]
