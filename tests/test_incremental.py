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
