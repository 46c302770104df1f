"""Round-12 optimization pins: each test locks an equivalence or plan
shape that an r12 performance change relies on.

- _int8_prep's cheap zero-vector guard (int8_scale > 0) keeps EXACTLY the
  rows of the old __n2 > 0 filter, including NULL/empty/zero vectors;
- the int8 scoring plan holds ONE ArrowEvalPython (the nondeterministic
  marker bars Catalyst from duplicating the pandas UDF into a pushed
  filter) and the scan-side Filter no longer embeds the quantize fold;
- the PQ encoder's exact int64 expansion picks the identical codeword
  (value and tie order) as the squared-difference form;
- the native partitioned Delta read gate accepts only provably
  round-tripping layouts and the native read equals the DataSource read;
- matryoshka_truncation_audit evaluates the truncated ranking ONCE
  (2 BNLJ scorings in the plan, not 3).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np
import pandas as pd  # noqa: F401 — pandas_udf type-hint resolution
import pytest
from pyspark.sql import functions as F

from duck_delta_share_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def spark():
    from duck_delta_share_spark.session import get_spark

    s = get_spark(app_name="r12-opt-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _old_prep(df, id_col, vec_col, id_alias):
    """The pre-r12 staging: filter on the materialized self-dot."""
    from duck_delta_share_spark.operators.embeddings import int8_scale, quantize_int8

    staged = df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias("__v"),
        int8_scale(vec_col).alias("__s"),
    ).select(id_alias, quantize_int8(F.col("__v"), F.col("__s")).alias("__q"))
    self_dot = F.aggregate(
        F.transform(F.col("__q"), lambda x: (x * x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return staged.select(id_alias, "__q", self_dot.alias("__n2")).filter(
        F.col("__n2") > 0
    )


def test_int8_prep_guard_equivalence(spark):
    rows = [
        (0, [1.0, -2.0, 3.0]),
        (1, [0.0, 0.0, 0.0]),  # zero vector: dropped by both guards
        (2, None),  # NULL vector: dropped by both
        (3, []),  # empty array: dropped by both
        (4, [-0.0, 0.0, -0.0]),  # negative zeros: dropped by both
        (5, [1e-30, 0.0, 0.0]),  # tiny but nonzero: kept by both
        (6, [127.0, -127.0, 1.0]),
        # NULL ELEMENT (ADVICE r12): array_max skips NULLs, so the scale
        # guard alone would keep this row (with NULL __q elements / NULL
        # __n2) while the old __n2 > 0 guard NULL-propagates and drops it
        (7, [1.0, None, 2.0]),
        (8, [None, None, None]),  # all-NULL elements: dropped by both
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    old = _old_prep(df, "vec_id", "embedding", "vec_id").orderBy("vec_id").collect()
    new = (
        sim._int8_prep(df, "vec_id", "embedding", "vec_id")
        .orderBy("vec_id")
        .collect()
    )
    assert [tuple(r) for r in old] == [tuple(r) for r in new]
    assert [r["vec_id"] for r in new] == [0, 5, 6]


def test_int8_plan_single_arrow_eval_and_clean_filter(spark):
    df = spark.createDataFrame(
        [(i, [float(i + j) for j in range(4)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = sim.int8_range_search(df, df.filter(F.col("vec_id") < 3), min_score_e6=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    # the scan-side Filter must hold the cheap scale guard, not the
    # inlined quantize+self-dot chain (the r12 pushdown defect)
    filter_lines = [l for l in plan.splitlines() if "Filter" in l]
    assert not any("aggregate(transform(transform" in l for l in filter_lines), plan


def test_pq_encode_expansion_matches_squared_difference():
    rng = np.random.RandomState(7)
    for k_codes in (3, 57):
        books = rng.randint(-127, 128, size=(k_codes, 8)).astype(np.int16)
        # force exact ties: duplicate codewords at different indexes
        books[1] = books[0]
        S = np.vstack([rng.randint(-127, 128, size=(200, 8)), books[:1]]).astype(
            np.int64
        )
        B = books.astype(np.int64)
        d2_ref = ((S[:, None, :] - B[None, :, :]) ** 2).sum(axis=2)
        self_dots = np.einsum("kd,kd->k", B, B)
        d2_new = self_dots[None, :] - 2 * (S @ B.T)
        assert (np.argmin(d2_ref, axis=1) == np.argmin(d2_new, axis=1)).all()


def test_native_partition_gate_and_read_equality(spark):
    from duck_delta_share_spark.sources.delta_log import (
        _native_partition_read_ok,
        read_delta,
        snapshot,
        write_delta,
    )

    root = Path(tempfile.mkdtemp(prefix="r12_part_gate_"))
    ok = root / "ok"
    df = spark.createDataFrame(
        [(1, 3, "a b"), (2, 4, "x-y"), (3, 3, "01")], "id int, p int, k string"
    )
    write_delta(df, ok, partition_by=["p", "k"])
    snap = snapshot(ok)
    assert _native_partition_read_ok(snap)
    got = read_delta(spark, ok)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))
    # logical column order preserved (Spark appends inferred partition
    # columns last; the fast path must restore it)
    assert got.columns == df.columns

    # '%' in a value would be unescaped by Spark's path parser -> fallback
    bad = root / "bad"
    write_delta(
        spark.createDataFrame([(1, "a%20b")], "id int, k string"),
        bad,
        partition_by=["k"],
    )
    assert not _native_partition_read_ok(snapshot(bad))
    assert [r["k"] for r in read_delta(spark, bad).collect()] == ["a%20b"]

    # a flat layout (partition values only in the log) must fall back:
    # simulate by rewriting the add action's url segment check input
    snap_ok = snapshot(ok)
    flat_files = [dict(f, url=f["url"].replace("/p=", "/np=")) for f in snap_ok.files]
    import dataclasses

    flat = dataclasses.replace(snap_ok, files=flat_files)
    assert not _native_partition_read_ok(flat)


def test_matryoshka_single_trunc_evaluation(spark):
    from duck_delta_share_spark.plans import QUERIES

    df = QUERIES["matryoshka_truncation_audit"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan
