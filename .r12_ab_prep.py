#!/usr/bin/env python
"""Interleaved A/B: old _int8_prep (filter on __n2 — pushdown inlines the
O(dim^2) chain into the Filter) vs new (cheap int8_scale>0 guard).
Bit-identity asserted on both queries at sf0.1 before timing."""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pandas as pd  # noqa: F401
from pyspark.sql import functions as F

from duck_delta_share_spark.session import get_spark
from duck_delta_share_spark.operators import similarity as sim
from duck_delta_share_spark.plans.registry import QUERIES  # noqa: F401
from duck_delta_share_spark.catalog import load_table

SF = "/root/testdata/sf0.1"


def old_prep(df, id_col, vec_col, id_alias):
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


def main():
    spark = get_spark(app_name="ab_prep")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda x: x, LongType())
    spark.range(32).select(warm("id")).count()

    e = load_table(spark, SF, "embeddings")

    def build(prep):
        saved = sim._int8_prep
        sim._int8_prep = prep
        try:
            topk = sim.int8_topk(e, e.filter(F.col("vec_id") < 10), k=5)
            rng = sim.int8_range_search(
                e, e.filter(F.col("vec_id") < 25), min_score_e6=300_000
            ).orderBy("query_id", "vec_id")
        finally:
            sim._int8_prep = saved
        return {"topk": topk, "range": rng}

    oldq, newq = build(old_prep), build(sim._int8_prep)

    # bit-identity
    for k in oldq:
        a = oldq[k].toPandas().sort_values(list(oldq[k].columns)).reset_index(drop=True)
        b = newq[k].toPandas().sort_values(list(newq[k].columns)).reset_index(drop=True)
        assert a.equals(b), f"MISMATCH {k}\n{a}\n{b}"
        print(f"{k}: identical ({len(a)} rows)")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for k in oldq:  # warm both
        force(oldq[k]); force(newq[k])
    t = {("old", k): [] for k in oldq} | {("new", k): [] for k in newq}
    for _ in range(5):
        for k in oldq:
            t0 = time.perf_counter(); force(oldq[k]); t[("old", k)].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); force(newq[k]); t[("new", k)].append(time.perf_counter() - t0)
    for (tag, k), ts in t.items():
        print(f"{tag} {k}: median {statistics.median(ts):.3f}s min {min(ts):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
