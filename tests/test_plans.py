"""Physical-plan assertions: the scale claims in docstrings must be visible
in `.explain` — pushdown reaches the scan, dims broadcast, zero-shuffle
operators really have no exchange. These tests pin the plans so a future
refactor that silently regresses the physical shape fails CI, not the
100 TB run."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.dedup import minhash_signatures
from duck_delta_share_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _plan(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_scan_pruned_and_pushed(spark):
    df = QUERIES["q1_pricing_summary"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_shipdate" in m.group(1), "shipdate filter not pushed to parquet"
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    cols = m.group(1)
    assert "l_comment" not in cols and "l_orderkey" not in cols, (
        "column pruning failed: scan reads unused columns"
    )


def test_q5_dimensions_broadcast(spark):
    plan = _plan(QUERIES["q5_local_supplier_volume"].spark_fn(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3, (
        "supplier/nation/region should broadcast-join"
    )
    assert "CartesianProduct" not in plan


def test_minhash_signatures_zero_extra_shuffle(spark):
    d = load_table(spark, SF_DIR, "documents")
    plan = _plan(minhash_signatures(d, num_hashes=8, shingle_n=3))
    # exactly one exchange: the explicit spread repartition; the signature
    # computation itself is a narrow map (the operator's core claim)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, n_exchanges


def test_filter_reaches_parquet_scan(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    df = l.filter(F.col("l_quantity") < 10).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "l_extendedprice" not in m.group(1), "projection not pruned"


def test_interval_join_not_cartesian(spark):
    plan = _plan(QUERIES["interval_join_attribution"].spark_fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, "interval join degenerated to cartesian"


def test_pack_sequences_no_single_partition_window(spark):
    """The global-order packing must never funnel the table through one
    task: both passes window within range partitions (VERDICT r1 #1)."""
    for name in ("sequence_packing", "sequence_packing_partitioned"):
        plan = _plan(QUERIES[name].spark_fn(spark, SF_DIR))
        assert "Exchange SinglePartition" not in plan, f"{name}: single-task window"
        assert "Window" in plan


def test_pack_sequences_two_pass_matches_naive_global(spark):
    """Two-pass distributed prefix sum == the naive single-window global
    running sum, bit for bit (the correctness claim of the rewrite)."""
    from pyspark.sql import Window

    from duck_delta_share_spark.operators.sessionize import pack_sequences

    d = load_table(spark, SF_DIR, "documents")
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(d, capacity_tokens=256, num_range_partitions=7).collect()
    }
    from duck_delta_share_spark.functions.text import token_count

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = (
        d.select("doc_id", token_count("text").alias("n_tokens"))
        .withColumn("e", F.sum("n_tokens").over(w))
        .collect()
    )
    assert len(naive) == len(got) > 0
    for r in naive:
        n, b, off = got[r["doc_id"]]
        assert n == r["n_tokens"]
        assert off == r["e"] - r["n_tokens"]
        assert b == (r["e"] - r["n_tokens"]) // 256
