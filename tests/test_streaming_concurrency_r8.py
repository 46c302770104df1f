"""Round-8 concurrency lens: the streaming maintenance single-writer
contract (two rollup streams racing one directory) — documented since
r5, ENFORCED since r8. Three injections:

- a second applier acquiring the directory makes the first fail LOUD at
  its next batch entry (never a silent pointer overwrite);
- ownership stolen MID-batch (after the entry check, before the flip)
  is caught by the pre-flip re-check and the pointer stays on the old
  generation;
- two real streams racing one directory end-to-end: the newer stream
  survives and stays exact-once, the older terminates with the
  single-writer error.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with sibling file)


def _batch(spark, rows):
    """CDF-shaped micro-batch frame: (k, v, _change_type, _commit_version)."""
    return spark.createDataFrame(
        rows, "k string, v double, _change_type string, _commit_version long"
    )


def _totals(spark, roll):
    from duck_delta_share_spark.streaming.incremental import read_rollup

    df = read_rollup(spark, roll)
    return {r["k"]: (r["n"], float(r["total"])) for r in df.collect()}


def test_second_applier_makes_first_fail_loud_at_batch_entry(spark, tmp_path):
    from duck_delta_share_spark.streaming.incremental import (
        acquire_rollup_ownership,
        rollup_upserter,
    )

    roll = tmp_path / "roll"
    e_a = acquire_rollup_ownership(roll, "writer-a")
    up_a = rollup_upserter(
        spark, roll, ["k"], {"total": "v"}, "writer-a", owner_epoch=e_a
    )
    up_a(_batch(spark, [("a", 1.0, "insert", 0), ("b", 2.0, "insert", 0)]), 0)
    assert _totals(spark, roll) == {"a": (1, 1.0), "b": (1, 2.0)}

    # a second stream acquires the SAME directory (fresh checkpoint, so
    # its batch 0 spans the old version 0 plus the new version 1 — the
    # watermark filter must apply only the unapplied remainder)
    e_b = acquire_rollup_ownership(roll, "writer-b")
    up_b = rollup_upserter(
        spark, roll, ["k"], {"total": "v"}, "writer-b", owner_epoch=e_b
    )
    up_b(
        _batch(
            spark,
            [
                ("a", 1.0, "insert", 0),
                ("b", 2.0, "insert", 0),
                ("a", 10.0, "insert", 1),
            ],
        ),
        0,
    )
    assert _totals(spark, roll) == {"a": (2, 11.0), "b": (1, 2.0)}

    # writer A's next batch must refuse at entry — applying it would
    # flip the pointer to a rollup missing B's version 1
    with pytest.raises(RuntimeError, match="single-writer"):
        up_a(_batch(spark, [("a", 10.0, "insert", 1)]), 1)
    assert _totals(spark, roll) == {"a": (2, 11.0), "b": (1, 2.0)}


def test_ownership_stolen_mid_batch_caught_before_flip(
    spark, tmp_path, monkeypatch
):
    import duck_delta_share_spark.streaming.incremental as inc

    roll = tmp_path / "roll"
    e_a = inc.acquire_rollup_ownership(roll, "writer-a")
    up_a = inc.rollup_upserter(
        spark, roll, ["k"], {"total": "v"}, "writer-a", owner_epoch=e_a
    )
    up_a(_batch(spark, [("a", 1.0, "insert", 0)]), 0)
    meta0 = json.loads((roll / "_meta.json").read_text())

    real_apply = inc.apply_changes_to_rollup

    def steal_then_apply(prev, changes, keys, sum_cols):
        # a second stream acquires AFTER writer A's entry check passed,
        # while A's batch is mid-fold — the pre-flip re-check must catch
        inc.acquire_rollup_ownership(roll, "thief")
        return real_apply(prev, changes, keys, sum_cols)

    monkeypatch.setattr(inc, "apply_changes_to_rollup", steal_then_apply)
    with pytest.raises(RuntimeError, match="single-writer"):
        up_a(_batch(spark, [("a", 10.0, "insert", 1)]), 1)
    # the pointer never flipped: still A's batch-0 generation exactly
    # (the thief's acquisition re-stamps owner_epoch — compare the
    # pointer fields, which must be untouched)
    meta1 = json.loads((roll / "_meta.json").read_text())
    assert (meta1["current"], meta1["last_version"]) == (
        meta0["current"],
        meta0["last_version"],
    )
    assert _totals(spark, roll) == {"a": (1, 1.0)}
    # the orphan generation dir A wrote pre-flip is harmless and stays
    # for the surviving owner's GC pass (documented in the upserter)


def test_stale_flip_through_the_checkwindow_trips_the_epoch_fence(
    spark, tmp_path
):
    """The check-then-act window between the pre-flip re-check and the
    replace cannot be closed on a plain filesystem — but a stale flip
    that slips through carries the OLD epoch, and the true owner's next
    batch must fail loud instead of folding onto the regressed pointer."""
    import duck_delta_share_spark.streaming.incremental as inc

    roll = tmp_path / "roll"
    e_a = inc.acquire_rollup_ownership(roll, "writer-a")
    up_a = inc.rollup_upserter(
        spark, roll, ["k"], {"total": "v"}, "writer-a", owner_epoch=e_a
    )
    up_a(_batch(spark, [("a", 1.0, "insert", 0)]), 0)

    # takeover: B acquires (re-stamps the pointer with its epoch), applies
    e_b = inc.acquire_rollup_ownership(roll, "writer-b")
    up_b = inc.rollup_upserter(
        spark, roll, ["k"], {"total": "v"}, "writer-b", owner_epoch=e_b
    )
    up_b(_batch(spark, [("a", 10.0, "insert", 1)]), 0)
    assert _totals(spark, roll) == {"a": (2, 11.0)}

    # writer A slips a stale pointer flip through the pre-flip window
    # (simulated as the raw replace A's upsert would have issued):
    # stale generation name, regressed watermark, A's old epoch
    inc._write_atomic(
        roll / "_meta.json",
        {"current": "data_v0", "last_version": 0, "owner_epoch": e_a},
    )
    # B's next batch detects the fence mismatch and refuses to fold
    with pytest.raises(RuntimeError, match="epoch"):
        up_b(_batch(spark, [("a", 100.0, "insert", 2)]), 1)


def test_two_real_streams_racing_one_directory(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_log import write_delta
    from duck_delta_share_spark.streaming.incremental import (
        maintain_rollup_stream,
    )

    t, roll = tmp_path / "tbl", tmp_path / "roll"
    ck_a, ck_b = tmp_path / "ck_a", tmp_path / "ck_b"
    write_delta(
        spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double"),
        t,
        mode="append",
    )
    q_a = maintain_rollup_stream(spark, t, ["k"], {"total": "v"}, roll, ck_a)
    q_b = None
    try:
        q_a.processAllAvailable()
        assert _totals(spark, roll) == {"a": (1, 1.0), "b": (1, 2.0)}
        # a second stream (own checkpoint) acquires the same directory
        q_b = maintain_rollup_stream(
            spark, t, ["k"], {"total": "v"}, roll, ck_b
        )
        q_b.processAllAvailable()
        write_delta(
            spark.createDataFrame([("a", 10.0)], "k string, v double"),
            t,
            mode="append",
        )
        q_b.processAllAvailable()
        # the survivor applied version 1 exactly once
        assert _totals(spark, roll) == {"a": (2, 11.0), "b": (1, 2.0)}
        # the older stream terminates LOUD on its next batch (never a
        # silent overwrite of the survivor's pointer)
        with pytest.raises(Exception, match="single-writer"):
            q_a.processAllAvailable()
            q_a.awaitTermination(60)
        assert _totals(spark, roll) == {"a": (2, 11.0), "b": (1, 2.0)}
    finally:
        q_a.stop()
        if q_b is not None:
            q_b.stop()
