"""approx_count_distinct accuracy: the HLL++ sketch must land within its
configured relative standard deviation (×3 for slack) of the exact count."""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    got = {
        r.l_returnflag: r.approx_orders
        for r in QUERIES["agg_approx_distinct"].spark_fn(spark, SF_DIR).collect()
    }
    l = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r.l_returnflag: r.d
        for r in l.groupBy("l_returnflag").agg(F.count_distinct("l_orderkey").alias("d")).collect()
    }
    assert set(got) == set(exact)
    for k, d in exact.items():
        assert abs(got[k] - d) <= max(3, 0.06 * d), (k, got[k], d)


def test_hll_sketch_union_matches_exact_within_tolerance(spark):
    from duck_delta_share_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["hll_mergeable_distinct"].spark_fn(spark, SF_DIR).collect()
    e = load_table(spark, SF_DIR, "events")
    exact_total = e.select("user_id").distinct().count()
    exact_per_type = {
        r.event_type: r.d
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert rows
    for r in rows:
        assert abs(r.distinct_users - exact_per_type[r.event_type]) <= max(
            2, 0.05 * exact_per_type[r.event_type]
        )
        # the UNION of per-type sketches estimates the global count
        assert abs(r.distinct_users_total - exact_total) <= max(2, 0.05 * exact_total)
