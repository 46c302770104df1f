"""r9 dataset-profiling primitives: table_profile + numeric_corr_matrix.

Beyond the driver-shaped oracle parity (sf0.001 here; the round driver
re-runs at sf0.01), these pin the engine-independent semantics the oracle
can't see: NULL handling in the profile, the zero-variance NULL guard in
the correlation (ANSI-total division), and numpy ground truth for the
pinned corr values.
"""

from __future__ import annotations

import numpy as np
import pytest

from duck_delta_share_spark.plans.functions_sweep import (
    numeric_corr_matrix_core,
    table_profile_core,
)
from parity import compare_frames, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    return duck_connection(SF_DIR)


def test_table_profile_oracle_parity(spark, oracle_con):
    from duck_delta_share_spark.plans import QUERIES

    q = QUERIES["table_profile"]
    errs = compare_frames(
        q.spark_fn(spark, SF_DIR).toPandas(),
        oracle_con.execute(q.oracle).df(),
        "table_profile",
    )
    assert not errs, errs


def test_numeric_corr_matrix_oracle_parity(spark, oracle_con):
    from duck_delta_share_spark.plans import QUERIES

    q = QUERIES["numeric_corr_matrix"]
    errs = compare_frames(
        q.spark_fn(spark, SF_DIR).toPandas(),
        oracle_con.execute(q.oracle).df(),
        "numeric_corr_matrix",
    )
    assert not errs, errs


def _lineitem_like(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    )


def test_profile_counts_nulls_and_distinct(spark):
    df = _lineitem_like(
        spark,
        [
            (1.0, 10.0, 0.01, None, "A", "F"),
            (1.0, 20.0, None, None, "A", "O"),
            (2.0, 20.0, 0.02, 0.05, None, "O"),
        ],
    )
    out = {r["col_name"]: r.asDict() for r in table_profile_core(df).collect()}
    assert set(out) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
    }
    q = out["l_quantity"]
    assert (q["n_rows"], q["n_null"], q["n_distinct"]) == (3, 0, 2)
    assert (q["min_e6"], q["max_e6"], q["sum_e6"]) == (1_000_000, 2_000_000, 4_000_000)
    d = out["l_discount"]
    assert (d["n_null"], d["n_distinct"]) == (1, 2)
    # sum skips NULLs like SQL SUM
    assert d["sum_e6"] == 30_000
    t = out["l_tax"]
    assert (t["n_null"], t["n_distinct"], t["sum_e6"]) == (2, 1, 50_000)
    rf = out["l_returnflag"]
    assert (rf["n_null"], rf["n_distinct"]) == (1, 1)
    assert rf["min_e6"] is None and rf["sum_e6"] is None


def test_profile_approx_mode_same_shape(spark):
    df = _lineitem_like(spark, [(1.0, 10.0, 0.01, 0.02, "A", "F")])
    exact = table_profile_core(df, exact_distinct=True)
    approx = table_profile_core(df, exact_distinct=False)
    assert exact.columns == approx.columns
    # on a 1-row frame HLL is exact too
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, approx.collect()))


def test_corr_matches_numpy_on_fixture(spark):
    from duck_delta_share_spark.catalog import load_table

    pdf = load_table(spark, SF_DIR, "lineitem").toPandas()
    cents = {
        c: np.floor(pdf[c].to_numpy() * 100 + 0.5)
        for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    }
    out = numeric_corr_matrix_core(load_table(spark, SF_DIR, "lineitem")).toPandas()
    for _, r in out.iterrows():
        expected = np.corrcoef(cents[r["col_x"]], cents[r["col_y"]])[0, 1]
        assert abs(r["corr_e9"] / 1e9 - expected) < 1e-6, (r["col_x"], r["col_y"])


def test_corr_zero_variance_yields_null_not_error(spark):
    # constant discount column: variance 0 -> corr undefined -> NULL
    # (under ANSI a naive division would throw; the lazy CASE keeps it total)
    df = _lineitem_like(
        spark,
        [
            (1.0, 10.0, 0.05, 0.01, "A", "F"),
            (2.0, 30.0, 0.05, 0.03, "A", "F"),
            (3.0, 20.0, 0.05, 0.02, "A", "F"),
        ],
    )
    out = numeric_corr_matrix_core(df).toPandas()
    disc = out[(out.col_x == "l_discount") | (out.col_y == "l_discount")]
    assert disc.corr_e9.isna().all()
    qp = out[(out.col_x == "l_quantity") & (out.col_y == "l_extendedprice")]
    # qty and price here are positively but not perfectly correlated
    assert 0 < qp.corr_e9.iloc[0] < 1_000_000_000


def test_corr_perfect_correlation_pins_to_e9(spark):
    df = _lineitem_like(
        spark,
        [
            (1.0, 100.0, 0.01, 0.08, "A", "F"),
            (2.0, 200.0, 0.02, 0.07, "A", "F"),
            (3.0, 300.0, 0.03, 0.06, "A", "F"),
        ],
    )
    out = numeric_corr_matrix_core(df).toPandas().set_index(["col_x", "col_y"])
    assert out.loc[("l_quantity", "l_extendedprice"), "corr_e9"] == 1_000_000_000
    assert out.loc[("l_quantity", "l_discount"), "corr_e9"] == 1_000_000_000
    assert out.loc[("l_quantity", "l_tax"), "corr_e9"] == -1_000_000_000


def test_corr_single_agg_plan_no_join(spark):
    from duck_delta_share_spark.catalog import load_table

    df = numeric_corr_matrix_core(load_table(spark, SF_DIR, "lineitem"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # narrow projection reaches the scan: only the 4 numeric columns read
    assert "l_returnflag" not in plan


def test_mad_outlier_oracle_parity(spark, oracle_con):
    from duck_delta_share_spark.plans import QUERIES

    q = QUERIES["mad_outlier_profile"]
    errs = compare_frames(
        q.spark_fn(spark, SF_DIR).toPandas(),
        oracle_con.execute(q.oracle).df(),
        "mad_outlier_profile",
    )
    assert not errs, errs


def _events_like(spark, rows):
    return spark.createDataFrame(rows, "event_type string, value double")


def test_mad_is_robust_where_zscore_is_not(spark):
    from duck_delta_share_spark.plans.functions_sweep import mad_outlier_profile_core

    # 9 values tightly clustered + one wild point: the wild point must be
    # the ONLY outlier (median/MAD ignore it; a mean/std z-score would be
    # dragged so far the wild point's own z shrinks — the classic masking)
    rows = [("a", 10.0 + i * 0.1) for i in range(9)] + [("a", 1e6)]
    out = mad_outlier_profile_core(_events_like(spark, rows)).collect()[0]
    assert out["n"] == 10
    assert out["n_outliers"] == 1
    # median of the 10 values is between 10.4 and 10.5 -> x2e6 grid
    assert out["med_x2e6"] == 2 * 10_450_000


def test_mad_zero_mad_flags_any_deviation(spark):
    from duck_delta_share_spark.plans.functions_sweep import mad_outlier_profile_core

    # constant group with one deviant: MAD = 0, so ANY |d| > 0 flags —
    # strict > keeps the constant members unflagged (d = 0 is not > 0)
    rows = [("a", 5.0)] * 7 + [("a", 5.1)]
    out = mad_outlier_profile_core(_events_like(spark, rows)).collect()[0]
    assert out["mad_x4e6"] == 0
    assert out["n_outliers"] == 1


def test_mad_nulls_excluded(spark):
    from duck_delta_share_spark.plans.functions_sweep import mad_outlier_profile_core

    rows = [("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0)]
    out = mad_outlier_profile_core(_events_like(spark, rows)).collect()[0]
    assert out["n"] == 3
    assert out["med_x2e6"] == 2 * 2_000_000


def test_mad_single_exchange_plan(spark):
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.plans.functions_sweep import mad_outlier_profile_core

    df = mad_outlier_profile_core(load_table(spark, SF_DIR, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both percentile windows + the final agg share one hash exchange
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:2000]


def test_minhash_recall_audit_oracle_parity(spark, oracle_con):
    from duck_delta_share_spark.plans import QUERIES

    q = QUERIES["minhash_recall_audit"]
    errs = compare_frames(
        q.spark_fn(spark, SF_DIR).toPandas(),
        oracle_con.execute(q.oracle).df(),
        "minhash_recall_audit",
    )
    assert not errs, errs


def test_minhash_recall_audit_invariants(spark):
    from duck_delta_share_spark.plans import QUERIES

    out = QUERIES["minhash_recall_audit"].spark_fn(spark, SF_DIR).collect()[0]
    # hits are the intersection: bounded by both sides
    assert out["n_hit"] <= out["n_truth"]
    assert out["n_hit"] <= out["n_candidates"]
    if out["n_truth"] > 0:
        import math

        assert out["recall_e6"] == math.floor(
            out["n_hit"] * 1e6 / out["n_truth"] + 0.5
        )
    # 8-hash/4-band banding catches exact-dup pairs with certainty
    # (identical texts -> identical signatures -> same buckets), and
    # every same-(lang,source) exact-dup pair is a truth pair (Jaccard
    # 1.0 > 0.15). Derive the recall FLOOR from the fixture instead of
    # pinning 1e6: the pin was fixture-content-dependent (it required
    # banding to catch every >0.15-Jaccard pair, brittle against
    # regenerated fixtures — the r3 events.parquet precedent).
    import math

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from pyspark.sql import functions as F

    exact_pairs = (
        docs.where(F.col("text").isNotNull())
        .groupBy("lang", "source", F.md5("text"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.sum(F.expr("n * (n - 1) / 2")).cast("long").alias("p"))
        .collect()[0]["p"]
    ) or 0
    # the sf0.001 fixture has near-dup truth pairs but no same-block
    # exact dups, so the derived floor may legitimately be 0 here —
    # the bound is what matters, not a content pin.
    assert out["n_truth"] >= exact_pairs >= 0
    assert out["n_truth"] >= 1
    floor_e6 = math.floor(exact_pairs * 1e6 / out["n_truth"] + 0.5)
    assert out["recall_e6"] >= floor_e6


def test_doclen_histogram_oracle_parity(spark, oracle_con):
    from duck_delta_share_spark.plans import QUERIES

    q = QUERIES["doclen_log2_histogram"]
    errs = compare_frames(
        q.spark_fn(spark, SF_DIR).toPandas(),
        oracle_con.execute(q.oracle).df(),
        "doclen_log2_histogram",
    )
    assert not errs, errs


def test_doclen_histogram_buckets_and_cumshare(spark):
    from duck_delta_share_spark.plans.llm_ops import doclen_log2_histogram_core

    d = spark.createDataFrame(
        [
            (1, "a"),                       # 1 token  -> bucket 0
            (2, "a b"),                     # 2 tokens -> bucket 1
            (3, "a b c"),                   # 3 tokens -> bucket 1
            (4, "a b c d e f g h"),         # 8 tokens -> bucket 3
            (5, None),                      # NULL text excluded
            (6, ""),                        # '' splits to [''] = 1 token
        ],
        "doc_id long, text string",
    )
    out = {r["bucket"]: r.asDict() for r in doclen_log2_histogram_core(d).collect()}
    assert set(out) == {0, 1, 3}
    assert out[0]["n_docs"] == 2 and out[0]["total_tokens"] == 2
    assert out[0]["lo_tokens"] == 1
    assert out[1]["n_docs"] == 2 and out[1]["total_tokens"] == 5
    assert out[3]["lo_tokens"] == 8
    # cumulative mass: 2, 7, 15 of 15 total
    assert out[3]["cum_docs"] == 5
    assert out[3]["cum_tokens"] == 15
    assert out[3]["cum_token_share_e6"] == 1_000_000
    assert out[0]["cum_token_share_e6"] == round(2 / 15 * 1e6)


def test_doclen_exact_power_of_two_bucket_boundary(spark):
    # the float-log2 hazard this query avoids: exactly 2^k tokens must
    # land in bucket k on BOTH engines (float log2 can floor to k-1)
    from duck_delta_share_spark.plans.llm_ops import doclen_log2_histogram_core

    rows = [(k, " ".join(["t"] * (2**k))) for k in range(1, 11)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = doclen_log2_histogram_core(d).collect()
    assert sorted(r["bucket"] for r in out) == list(range(1, 11))
    assert all(r["n_docs"] == 1 for r in out)
    assert all(r["lo_tokens"] == r["total_tokens"] for r in out)


def test_split_leakage_oracle_parity(spark, oracle_con):
    from duck_delta_share_spark.plans import QUERIES

    q = QUERIES["split_leakage_audit"]
    errs = compare_frames(
        q.spark_fn(spark, SF_DIR).toPandas(),
        oracle_con.execute(q.oracle).df(),
        "split_leakage_audit",
    )
    assert not errs, errs


def test_split_leakage_detects_planted_cross_split_dup(spark):
    from duck_delta_share_spark.plans.llm_ops import split_leakage_audit_core
    from pyspark.sql import functions as F

    # find two doc_ids that the md5 rule puts in train and test, plant
    # identical text on both — the audit must count exactly one leaky
    # fingerprint and one train<->test pair
    base = spark.createDataFrame(
        [(i, f"unique text {i}") for i in range(200)], "doc_id long, text string"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    rows = base.select("doc_id", bucket.alias("b")).collect()
    train_id = next(r.doc_id for r in rows if r.b < 80)
    test_id = next(r.doc_id for r in rows if r.b >= 90)
    planted = base.withColumn(
        "text",
        F.when(F.col("doc_id").isin(train_id, test_id), "LEAKED DOC").otherwise(
            F.col("text")
        ),
    )
    out = split_leakage_audit_core(planted).collect()[0]
    assert out["n_docs"] == 200
    assert out["n_fingerprints"] == 199  # two docs share one fp
    assert out["n_leaky_fps"] == 1
    assert out["n_docs_in_leaky"] == 2
    assert out["train_test_leak_fps"] == 1


def test_split_leakage_same_split_dup_not_leaky(spark):
    from duck_delta_share_spark.plans.llm_ops import split_leakage_audit_core
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(i, f"unique text {i}") for i in range(200)], "doc_id long, text string"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    rows = base.select("doc_id", bucket.alias("b")).collect()
    train_ids = [r.doc_id for r in rows if r.b < 80][:2]
    planted = base.withColumn(
        "text",
        F.when(F.col("doc_id").isin(*train_ids), "DUP WITHIN TRAIN").otherwise(
            F.col("text")
        ),
    )
    out = split_leakage_audit_core(planted).collect()[0]
    # duplicate content within ONE split is dedup's business, not leakage
    assert out["n_leaky_fps"] == 0
    assert out["train_test_leak_fps"] == 0
