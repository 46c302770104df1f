"""Incremental view maintenance: signed CDF deltas must reproduce the
from-scratch rollup exactly, including update images and key retirement."""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.operators.incremental import (
    apply_changes_to_rollup,
    rollup_from_scratch,
)


def _collect(df):
    return {
        tuple(r[k] for k in ("g", "n")) + (float(r["total"]),)
        for r in df.collect()
    }


def test_updates_and_key_retirement(spark):
    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], "g string, v double"
    )
    prev = rollup_from_scratch(base, ["g"], {"total": "v"})

    # update one 'a' row 10->15 (pre+post images), delete ALL of 'b',
    # insert a brand-new key 'c'
    changes = spark.createDataFrame(
        [
            ("a", 10.0, "update_preimage"),
            ("a", 15.0, "update_postimage"),
            ("b", 5.0, "delete"),
            ("c", 7.0, "insert"),
        ],
        "g string, v double, _change_type string",
    )
    new = apply_changes_to_rollup(prev, changes, ["g"], {"total": "v"})
    assert _collect(new) == {("a", 2, 35.0), ("c", 1, 7.0)}  # 'b' retired

    # equivalence: applying changes == recomputing the final state
    final_state = spark.createDataFrame(
        [("a", 15.0), ("a", 20.0), ("c", 7.0)], "g string, v double"
    )
    assert _collect(new) == _collect(
        rollup_from_scratch(final_state, ["g"], {"total": "v"})
    )


def test_empty_change_batch_is_identity(spark):
    base = spark.createDataFrame([("a", 1.5)], "g string, v double")
    prev = rollup_from_scratch(base, ["g"], {"total": "v"})
    empty = spark.createDataFrame([], "g string, v double, _change_type string")
    assert _collect(apply_changes_to_rollup(prev, empty, ["g"], {"total": "v"})) == _collect(prev)


def _as_set(df):
    return {
        (r.s_nationkey, r.n, float(r.total_bal)) for r in df.collect()
    }


def test_streaming_maintained_rollup_tracks_table(spark, tmp_path):
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        merge_delta,
        read_delta,
        write_delta,
    )
    from duck_delta_share_spark.streaming.incremental import (
        maintain_rollup_stream,
        read_rollup,
    )
    from tests.conftest import SF_DIR

    t = tmp_path / "tbl"
    s = load_table(spark, SF_DIR, "supplier")
    write_delta(s, t)
    roll, ck = tmp_path / "rollup", tmp_path / "ck"

    def expect():
        return _as_set(
            rollup_from_scratch(
                read_delta(spark, t), ["s_nationkey"], {"total_bal": "s_acctbal"}
            )
        )

    q = maintain_rollup_stream(
        spark, t, ["s_nationkey"], {"total_bal": "s_acctbal"}, roll, ck
    )
    try:
        q.processAllAvailable()
        assert _as_set(read_rollup(spark, roll)) == expect()

        # live append + merge while the stream runs
        write_delta(s.limit(3), t, mode="append")
        upd = s.filter(F.col("s_suppkey") == 1).withColumn(
            "s_acctbal", F.lit(777.0)
        )
        merge_delta(spark, t, upd, ["s_suppkey"])
        q.processAllAvailable()
        assert _as_set(read_rollup(spark, roll)) == expect()
    finally:
        q.stop()

    # change while the stream is DOWN, restart from checkpoint: rollup
    # catches up without double-counting the already-applied history
    write_delta(s.limit(2), t, mode="append")
    q2 = maintain_rollup_stream(
        spark, t, ["s_nationkey"], {"total_bal": "s_acctbal"}, roll, ck
    )
    try:
        q2.processAllAvailable()
        assert _as_set(read_rollup(spark, roll)) == expect()
    finally:
        q2.stop()


def test_streaming_rollup_gcs_generations(spark, tmp_path):
    """Superseded data_<id> generations are GC'd after the pointer flip
    (keeping one for crash safety), and a no-op epoch only advances the
    replay watermark instead of rewriting the rollup (self-review r5)."""
    import json as _json

    from duck_delta_share_spark.sources.delta_log import write_delta
    from duck_delta_share_spark.streaming.incremental import (
        maintain_rollup_stream,
        read_rollup,
    )

    t = tmp_path / "tbl"
    base = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0)], "k long, v double"
    )
    write_delta(base, t)
    roll, ck = tmp_path / "roll", tmp_path / "ck"
    roll.mkdir()
    # orphan pointer tmp from a crashed flip: the stream must reclaim it
    orphan = roll / "._meta.json.deadbeef.tmp"
    orphan.write_text("{")
    q = maintain_rollup_stream(spark, t, ["k"], {"total": "v"}, roll, ck)
    try:
        q.processAllAvailable()
        for wave in range(3):
            write_delta(
                spark.createDataFrame([(3 + wave, 1.0)], "k long, v double"), t
            )
            q.processAllAvailable()
    finally:
        q.stop()
    gens = sorted(d.name for d in roll.iterdir() if d.name.startswith("data_"))
    assert len(gens) <= 2, gens  # current + one crash-safety predecessor
    assert not orphan.exists(), "abandoned pointer tmp must be reclaimed"
    meta = _json.loads((roll / "_meta.json").read_text())
    assert meta["current"] in gens
    got = {(r.k, round(r.total, 6)) for r in read_rollup(spark, roll).collect()}
    assert got == {(1, 15.0), (2, 7.0), (3, 1.0), (4, 1.0), (5, 1.0)}
