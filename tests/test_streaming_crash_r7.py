"""Round-7 crash lenses: (a) failure injection on the maintenance
stream's rollup/pointer persistence — a lost rollup directory paired
with a live checkpoint must fail LOUD (silent empty-rebuild drops all
history), a crash between the generation write and the pointer flip
must recover exactly-once on replay; (b) mid-loop failures in the
iterative operators (BPE, connected components) must release every
live localCheckpoint on the way out instead of pinning blocks until
driver GC."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _write_tbl(spark, t, rows):
    from duck_delta_share_spark.sources.delta_log import write_delta

    write_delta(
        spark.createDataFrame(rows, "k string, v double"), t, mode="append"
    )


def _rollup_totals(spark, roll):
    from duck_delta_share_spark.streaming.incremental import read_rollup

    df = read_rollup(spark, roll)
    return {r["k"]: (r["n"], float(r["total"])) for r in df.collect()}


def test_lost_rollup_dir_with_live_checkpoint_fails_loud(spark, tmp_path):
    import shutil

    from duck_delta_share_spark.streaming.incremental import (
        maintain_rollup_stream,
    )

    t, roll, ck = tmp_path / "tbl", tmp_path / "roll", tmp_path / "ck"
    _write_tbl(spark, t, [("a", 1.0), ("b", 2.0)])
    q = maintain_rollup_stream(spark, t, ["k"], {"total": "v"}, roll, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _rollup_totals(spark, roll) == {"a": (1, 1.0), "b": (1, 2.0)}
    # the rollup directory is lost (wiped / repointed) while the
    # CHECKPOINT keeps its batch history — the next batch must refuse
    shutil.rmtree(roll)
    roll.mkdir()
    _write_tbl(spark, t, [("a", 10.0)])
    q2 = maintain_rollup_stream(spark, t, ["k"], {"total": "v"}, roll, ck)
    with pytest.raises(Exception, match="no _meta.json|rollup state was lost"):
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()


def test_crash_between_generation_write_and_flip_recovers(spark, tmp_path):
    from duck_delta_share_spark.streaming.incremental import (
        maintain_rollup_stream,
    )

    t, roll, ck = tmp_path / "tbl", tmp_path / "roll", tmp_path / "ck"
    _write_tbl(spark, t, [("a", 1.0), ("b", 2.0)])
    q = maintain_rollup_stream(spark, t, ["k"], {"total": "v"}, roll, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    meta0 = json.loads((roll / "_meta.json").read_text())
    # simulate a crash AFTER the next batch wrote its generation dir but
    # BEFORE the pointer flip: the orphan dir exists (torn), the pointer
    # still names the old generation, the checkpoint never committed
    _write_tbl(spark, t, [("a", 10.0)])  # becomes source version 1
    orphan = roll / "data_v1"
    orphan.mkdir()
    (orphan / "part-00000.parquet").write_bytes(b"torn garbage")
    q2 = maintain_rollup_stream(spark, t, ["k"], {"total": "v"}, roll, ck)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    meta1 = json.loads((roll / "_meta.json").read_text())
    assert meta1["last_version"] > meta0["last_version"]
    # the replay overwrote the torn orphan and the totals are exact-once
    assert _rollup_totals(spark, roll) == {
        "a": (2, 11.0),
        "b": (1, 2.0),
    }


def test_orphan_pointer_tmps_reclaimed_on_next_batch(spark, tmp_path):
    from duck_delta_share_spark.streaming.incremental import (
        maintain_rollup_stream,
    )

    t, roll, ck = tmp_path / "tbl", tmp_path / "roll", tmp_path / "ck"
    _write_tbl(spark, t, [("a", 1.0)])
    roll.mkdir()
    # a writer that crashed between the tmp write and the atomic replace
    stale = roll / "._meta.json.deadbeef.tmp"
    stale.write_text('{"current": "data_v0"}')
    q = maintain_rollup_stream(spark, t, ["k"], {"total": "v"}, roll, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert not stale.exists(), "orphan pointer tmp must be reclaimed"
    assert (roll / "_meta.json").exists()


def _checkpoint_release_recorder(monkeypatch, module):
    """Record every localCheckpoint result and every release call so a
    test can assert released == checkpointed after a mid-loop failure."""
    # patch the CLASSIC frame class: pyspark.sql.DataFrame is the
    # abstract base in Spark 4 and classic sessions dispatch to the
    # subclass override
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    checkpointed: list[int] = []
    released: list[int] = []
    real_ckpt = ClassicDF.localCheckpoint

    def rec_ckpt(self, eager=True):
        out = real_ckpt(self, eager=eager)
        checkpointed.append(id(out))
        return out

    monkeypatch.setattr(ClassicDF, "localCheckpoint", rec_ckpt)
    real_rel = module.release_local_checkpoint

    def rec_rel(df):
        if df is not None:
            released.append(id(df))
        real_rel(df)

    monkeypatch.setattr(module, "release_local_checkpoint", rec_rel)
    return checkpointed, released


class _FailingF:
    """Proxy over pyspark.sql.functions that raises on the Nth call of
    one attribute — a deterministic mid-loop failure injection point."""

    def __init__(self, attr, fail_at):
        self._attr, self._fail_at, self._n = attr, fail_at, 0

    def __getattr__(self, name):
        real = getattr(F, name)
        if name != self._attr:
            return real

        def wrapped(*a, **kw):
            self._n += 1
            if self._n >= self._fail_at:
                raise RuntimeError("injected mid-loop failure")
            return real(*a, **kw)

        return wrapped


def test_bpe_mid_loop_failure_releases_all_checkpoints(spark, monkeypatch):
    import duck_delta_share_spark.operators.bpe as bpe

    checkpointed, released = _checkpoint_release_recorder(monkeypatch, bpe)
    # only the loop's pair-count agg uses F.sum (once per round;
    # _word_freqs aggregates with F.count): fail entering round 2
    monkeypatch.setattr(bpe, "F", _FailingF("sum", 2))
    docs = spark.createDataFrame(
        [("aaab aab",), ("aab aaab",), ("abab abab",)], "text string"
    )
    with pytest.raises(RuntimeError, match="injected mid-loop failure"):
        # driver_vocab_rows=0 forces the DISTRIBUTED loop — the release
        # invariant under test lives there (r13: small vocabs train
        # in-driver and never checkpoint)
        bpe.train_bpe_merges(
            docs, n_merges=5, min_pair_count=1, driver_vocab_rows=0
        )
    assert checkpointed, "the loop must have checkpointed at least once"
    assert set(released) == set(checkpointed), (
        "a mid-loop failure must release every live localCheckpoint "
        f"(checkpointed {len(checkpointed)}, released {len(released)})"
    )


def test_components_star_mid_loop_failure_releases_all(spark, monkeypatch):
    import duck_delta_share_spark.operators.components as comp

    checkpointed, released = _checkpoint_release_recorder(monkeypatch, comp)
    calls = {"n": 0}
    real = comp._small_star

    def boom(e):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected mid-loop failure")
        return real(e)

    monkeypatch.setattr(comp, "_small_star", boom)
    # a chain needs multiple star rounds, plus one self-loop node
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(99, 99)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="injected mid-loop failure"):
        # driver_gate_edges=0 forces the DISTRIBUTED star loop — the
        # release invariant under test lives there (r13: small edge sets
        # run union-find in the driver and never enter the loop)
        comp.connected_components(edges, driver_gate_edges=0).collect()
    assert checkpointed
    assert set(released) == set(checkpointed)


def test_components_hashmin_mid_loop_failure_releases_all(spark, monkeypatch):
    import duck_delta_share_spark.operators.components as comp

    checkpointed, released = _checkpoint_release_recorder(monkeypatch, comp)
    # each hashmin round calls F.least exactly once: fail in round 2
    monkeypatch.setattr(comp, "F", _FailingF("least", 2))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="injected mid-loop failure"):
        comp.connected_components(edges, algorithm="hashmin").collect()
    assert checkpointed
    assert set(released) == set(checkpointed)


def test_components_count_action_failure_releases_new_round(spark, monkeypatch):
    # the likeliest executor-failure point is the changed-count ACTION
    # after the new round is already materialized: the handler must
    # release the just-checkpointed new_labels too (r7 self-review)
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    import duck_delta_share_spark.operators.components as comp

    checkpointed, released = _checkpoint_release_recorder(monkeypatch, comp)
    real_count = ClassicDF.count
    state = {"n": 0}

    def failing_count(self):
        state["n"] += 1
        if state["n"] >= 1:
            raise RuntimeError("injected count failure")
        return real_count(self)

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    # patch AFTER frame construction so setup counts are unaffected
    monkeypatch.setattr(ClassicDF, "count", failing_count)
    with pytest.raises(RuntimeError, match="injected count failure"):
        comp.connected_components(edges, algorithm="hashmin").collect()
    assert checkpointed
    assert set(released) == set(checkpointed)


def test_iterative_success_paths_unchanged(spark):
    # the cleanup handlers must not change results on the happy path
    from duck_delta_share_spark.operators.bpe import train_bpe_merges
    from duck_delta_share_spark.operators.components import (
        connected_components,
    )

    docs = spark.createDataFrame([("aaab aab",), ("aab aaab",)], "text string")
    merges = train_bpe_merges(docs, n_merges=3, min_pair_count=1)
    assert merges, "BPE must still learn merges"
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    got = {
        (r.node, r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
