#!/usr/bin/env python
"""Decompose int8_range_search's residual cost at sf0.1."""
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
from duck_delta_share_spark.catalog import load_table

SF = "/root/testdata/sf0.1"


def force(df):
    df.write.format("noop").mode("overwrite").save()


def med(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    spark = get_spark(app_name="prof_range")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda x: x, LongType())
    spark.range(32).select(warm("id")).count()

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 25)

    b = sim._int8_prep(e, "vec_id", "embedding", "vec_id").withColumnsRenamed(
        {"__q": "__bq", "__n2": "__bn2"})
    qq = sim._int8_prep(q, "vec_id", "embedding", "query_id").withColumnsRenamed(
        {"__q": "__qq", "__n2": "__qn2"})
    print("prep_base      ", med(lambda: force(b)))
    joined = b.join(F.broadcast(qq), F.col("vec_id") != F.col("query_id"))
    print("join_only      ", med(lambda: force(joined)))
    arrow = joined.withColumn("__idot", sim._pair_idot("arrow"))
    print("join+arrow_idot", med(lambda: force(arrow)))
    expr = joined.withColumn("__idot", sim._pair_idot("expr"))
    print("join+expr_idot ", med(lambda: force(expr)))
    full_arrow = sim.int8_range_search(e, q, min_score_e6=300_000).orderBy("query_id", "vec_id")
    print("full(arrow)    ", med(lambda: force(full_arrow)))
    full_expr = sim.int8_range_search(e, q, min_score_e6=300_000, scorer="expr").orderBy("query_id", "vec_id")
    print("full(expr)     ", med(lambda: force(full_expr)))
    # identity of the two dials
    a = full_arrow.toPandas(); x = full_expr.toPandas()
    assert a.equals(x), "scorer dials diverge"
    print("dials identical", len(a))
    # how many partitions does the base scan have?
    print("base scan partitions:", b.rdd.getNumPartitions())
    spark.stop()


if __name__ == "__main__":
    main()
