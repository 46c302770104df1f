"""Incremental cross-snapshot dedup (r10): a new shard deduped against the
accumulated corpus via the maintained fingerprint STORE, with transactional
exactly-once appends to BOTH tables.

The operator's contract (operators/dedup.py incremental_dedup_commit):

1. survivors = within-shard exact dedup + anti-join vs the store's fps —
   history is never rescanned.
2. corpus-first commit order: a crash between the two commits leaves the
   store LAGGING (never ahead) — the replay, recomputing against the
   unchanged store, reproduces the identical survivor set and completes
   the store append. Store-ahead would poison the replay's anti-join.
3. After any crash + replay, corpus fingerprints == store fingerprints
   (the never-diverge invariant) and each survivor appears exactly once.

The crash lens reuses the r9 crash-matrix harness: crash at EVERY
Python-side filesystem mutation the operation makes, then assert
never-ahead mid-crash and exact convergence after replay.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from duck_delta_share_spark.functions.text import fingerprint
from duck_delta_share_spark.operators.dedup import (
    exact_dedup,
    incremental_dedup_commit,
)
from duck_delta_share_spark.sources.delta_log import (
    last_txn_version,
    read_delta,
    write_delta,
)


class SimulatedCrash(BaseException):
    """BaseException so no except-Exception handler can swallow it."""


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
    (3, "de", "book", "unique history text"),
]
# shard: one exact dup of history (doc 10 ~ doc 1, differing case/spaces),
# one intra-shard dup pair (11/12), one fresh doc (13)
SHARD = [
    (10, "en", "web", "The  quick  brown FOX"),
    (11, "en", "crawl", "fresh shard text one"),
    (12, "en", "crawl", "fresh  SHARD text ONE"),
    (13, "fr", "crawl", "nouveau document"),
]
# survivors: 11 (lowest id of the 11/12 pair) and 13
SURVIVOR_IDS = {11, 13}


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _seed(spark, base: Path):
    corpus, store = base / "corpus", base / "fps"
    hist = _docs(spark, HISTORY)
    seed = exact_dedup(hist, "text", "doc_id")
    write_delta(seed, corpus)
    write_delta(seed.select(fingerprint("text").alias("fp"), "doc_id"), store)
    return corpus, store


def _fps(spark, table, text_based: bool) -> set:
    df = read_delta(spark, table)
    if text_based:
        df = df.select(fingerprint("text").alias("fp"))
    else:
        df = df.select("fp")
    return {r.fp for r in df.collect()}


def test_survivors_and_replay_noop(spark, tmp_path):
    corpus, store = _seed(spark, tmp_path)
    r1 = incremental_dedup_commit(
        spark, _docs(spark, SHARD), corpus, store, "loader", 1
    )
    assert r1["n_survivors"] == len(SURVIVOR_IDS)
    assert r1["corpus_version"] is not None and r1["store_version"] is not None

    ids = {r.doc_id for r in read_delta(spark, corpus).collect()}
    assert ids == {1, 2, 3} | SURVIVOR_IDS
    # never-diverge: store fps == corpus fps, one per doc
    assert _fps(spark, store, False) == _fps(spark, corpus, True)
    store_rows = read_delta(spark, store).collect()
    assert len(store_rows) == len({r.fp for r in store_rows}) == 5

    # replay of the same shard: full no-op on both tables
    r2 = incremental_dedup_commit(
        spark, _docs(spark, SHARD), corpus, store, "loader", 1
    )
    assert r2 == {"n_survivors": None, "corpus_version": None, "store_version": None}
    assert {r.doc_id for r in read_delta(spark, corpus).collect()} == ids


def test_second_shard_dedups_against_history_not_rescan(spark, tmp_path):
    """Shard 2 carrying dups of shard 1's survivors must be filtered by
    the STORE alone (the corpus table is never read by the operator)."""
    corpus, store = _seed(spark, tmp_path)
    incremental_dedup_commit(spark, _docs(spark, SHARD), corpus, store, "loader", 1)
    shard2 = [
        (20, "en", "crawl", "fresh shard text one"),  # dup of survivor 11
        (21, "en", "web", "jumps over the LAZY dog"),  # dup of history 2
        (22, "es", "crawl", "texto totalmente nuevo"),
    ]
    r = incremental_dedup_commit(
        spark, _docs(spark, shard2), corpus, store, "loader", 2
    )
    assert r["n_survivors"] == 1
    ids = {r_.doc_id for r_ in read_delta(spark, corpus).collect()}
    assert ids == {1, 2, 3, 11, 13, 22}
    assert _fps(spark, store, False) == _fps(spark, corpus, True)


def test_stale_shard_version_is_noop(spark, tmp_path):
    corpus, store = _seed(spark, tmp_path)
    incremental_dedup_commit(spark, _docs(spark, SHARD), corpus, store, "loader", 5)
    r = incremental_dedup_commit(
        spark, _docs(spark, SHARD), corpus, store, "loader", 3
    )
    assert r == {"n_survivors": None, "corpus_version": None, "store_version": None}


def _run_op(spark, corpus, store):
    incremental_dedup_commit(spark, _docs(spark, SHARD), corpus, store, "loader", 1)


def test_crash_matrix_never_diverge(spark, tmp_path, monkeypatch):
    """Crash at EVERY filesystem mutation of the two-table ingest; after
    each crash: (a) the store is never AHEAD of the corpus (a store fp
    whose doc is missing would make the replay drop that doc forever),
    (b) a replayed ingest converges to the exact final state with each
    survivor exactly once, (c) corpus and store fingerprints end equal."""
    # dry run to count mutations
    c0, s0 = _seed(spark, tmp_path / "count")
    with pytest.MonkeyPatch.context() as mp:
        fault = _FsFault(mp, crash_at=None)
        _run_op(spark, c0, s0)
    n_ops = fault.n
    assert n_ops >= 4, "ingest no longer routes through the wrapped fs ops"

    want_ids = {1, 2, 3} | SURVIVOR_IDS
    for k in range(1, n_ops + 1):
        base = tmp_path / f"k{k}"
        corpus, store = _seed(spark, base)
        with pytest.MonkeyPatch.context() as mp:
            _FsFault(mp, crash_at=k)
            with pytest.raises(SimulatedCrash):
                _run_op(spark, corpus, store)

        # (a) mid-crash: store never ahead of corpus
        corpus_fps = _fps(spark, corpus, True)
        store_fps = _fps(spark, store, False)
        assert store_fps <= corpus_fps, (
            f"k={k}: store is AHEAD of corpus — replay would drop docs"
        )
        # corpus itself is never torn: seed state or fully-appended state
        ids = {r.doc_id for r in read_delta(spark, corpus).collect()}
        assert ids in ({1, 2, 3}, want_ids), f"k={k}: torn corpus {sorted(ids)}"

        # (b) replay converges exactly-once
        _run_op(spark, corpus, store)
        ids = sorted(r.doc_id for r in read_delta(spark, corpus).collect())
        assert ids == sorted(want_ids), f"k={k}: recovery not exactly-once {ids}"
        # (c) never-diverge after recovery
        assert _fps(spark, store, False) == _fps(spark, corpus, True), f"k={k}"
        store_rows = read_delta(spark, store).collect()
        assert len(store_rows) == len({r.fp for r in store_rows}), f"k={k}"
        assert last_txn_version(corpus, "loader") == 1
        assert last_txn_version(store, "loader") == 1


def test_incremental_neardup_candidates_cap_and_parity(spark, tmp_path):
    """The capped path must (a) agree with the uncapped path when no
    bucket exceeds the cap, and (b) drop every pair of an over-cap
    bucket on BOTH sides (the union cap: a hot bucket is hot regardless
    of which side its members came from)."""
    from duck_delta_share_spark.operators.dedup import (
        incremental_neardup_candidates,
        minhash_md5_band_rows,
        minhash_md5_signatures,
    )

    # history: 3 near-identical docs (one hot set of buckets) + 1 unique;
    # shard: 2 near-copies of the hot text + 1 unique
    hist_rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
        (4, "completely different historical content here now"),
    ]
    shard_rows = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),
        (11, "alpha beta gamma delta epsilon zeta eta theta"),
        (12, "another fresh unique shard document text body"),
    ]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    shard = spark.createDataFrame(shard_rows, "doc_id long, text string")
    store = tmp_path / "buckets"
    sigs = minhash_md5_signatures(hist, num_hashes=8, shingle_n=3)
    write_delta(minhash_md5_band_rows(sigs, num_hashes=8, bands=4), store)

    def pairs(cap):
        return {
            (r.id_new, r.id_old, r.n_shared_bands)
            for r in incremental_neardup_candidates(
                spark, shard, store, num_hashes=8, bands=4, shingle_n=3,
                max_bucket_size=cap,
            ).collect()
        }

    uncapped = pairs(None)
    # identical texts share all 4 bands; each shard hot doc pairs with
    # each of the 3 hot history docs
    assert uncapped == {
        (n, o, 4) for n in (10, 11) for o in (1, 2, 3)
    }
    # a generous cap changes nothing
    assert pairs(100) == uncapped
    # the hot bucket holds 3 hist + 2 shard = 5 members; cap=4 kills it
    # on BOTH sides -> no history candidates survive
    assert pairs(4) == set()


def test_incremental_neardup_store_never_rescans_history(spark, tmp_path):
    """Corrupting the HISTORY documents after the store is built must not
    change the candidates — proof the operator reads only the store."""
    from duck_delta_share_spark.operators.dedup import (
        incremental_neardup_candidates,
        minhash_md5_band_rows,
        minhash_md5_signatures,
    )

    hist = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    shard = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    store = tmp_path / "buckets"
    sigs = minhash_md5_signatures(hist, num_hashes=8, shingle_n=3)
    write_delta(minhash_md5_band_rows(sigs, num_hashes=8, bands=4), store)
    got = incremental_neardup_candidates(
        spark, shard, store, max_bucket_size=None
    ).collect()
    assert {(r.id_new, r.id_old, r.n_shared_bands) for r in got} == {(10, 1, 4)}


def test_empty_shard_commits_marker_and_pipeline_continues(spark, tmp_path):
    """Daily pipelines get empty shards: the ingest must still record the
    (appId, version) marker — an unmarked gap would make a later replay
    of that shard version re-run — and the next shard proceeds normally."""
    corpus, store = _seed(spark, tmp_path)
    empty = spark.createDataFrame([], SCHEMA)
    r = incremental_dedup_commit(spark, empty, corpus, store, "loader", 1)
    assert r["n_survivors"] == 0
    assert r["corpus_version"] is not None and r["store_version"] is not None
    assert last_txn_version(corpus, "loader") == 1
    assert last_txn_version(store, "loader") == 1
    assert {x.doc_id for x in read_delta(spark, corpus).collect()} == {1, 2, 3}
    # replay of the empty shard: full no-op
    r2 = incremental_dedup_commit(spark, empty, corpus, store, "loader", 1)
    assert r2 == {"n_survivors": None, "corpus_version": None, "store_version": None}
    # the pipeline continues
    r3 = incremental_dedup_commit(
        spark, _docs(spark, SHARD), corpus, store, "loader", 2
    )
    assert r3["n_survivors"] == len(SURVIVOR_IDS)
    assert _fps(spark, store, False) == _fps(spark, corpus, True)
