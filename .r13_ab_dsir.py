#!/usr/bin/env python
"""Interleaved A/B: dsir window-over-bucket (old) vs bucket-totals
broadcast join (new, r13), one session, median-of-5, plus a runtime
check that the new shape's expensive exchange is REUSED (executes once).
Also asserts bit-identical output."""
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
SF_DIR = "/root/testdata/sf0.1"


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def old_dsir(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.functions.text import tokenize, word_shingles

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tok = d.select("doc_id", "lang", tokenize("text").alias("__toks"))
    toks = tok.select(
        "doc_id", "lang",
        F.explode(F.concat(F.col("__toks"), word_shingles(F.col("__toks"), 2))).alias("term"),
    )
    b = toks.select(
        "doc_id", "lang",
        (F.conv(F.substring(F.md5("term"), 1, 7), 16, 10).cast("long") % 4096).alias("bucket"),
    )
    g = b.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum((F.col("lang") == "en").cast("long")).alias("ek"),
    )
    bw = Window.partitionBy("bucket")
    scored = g.select(
        "doc_id", "k",
        F.floor((F.coalesce(F.sum("ek").over(bw), F.lit(0)) + 1) * F.lit(1000000.0)
                / (F.sum("k").over(bw) + 1)).cast("long").alias("ratio_e6"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("k").cast("long").alias("n_terms"),
             F.sum(F.col("k") * F.col("ratio_e6")).cast("long").alias("dsir_score"))
        .orderBy(F.col("dsir_score").desc(), "doc_id").limit(100)
    )


def main():
    from duck_delta_share_spark.plans import QUERIES
    from duck_delta_share_spark.session import get_spark

    spark = get_spark(app_name="r13-ab-dsir")
    spark.sparkContext.setLogLevel("ERROR")
    new_fn = QUERIES["dsir_importance_weights"].spark_fn

    # bit-identity
    a = old_dsir(spark, SF_DIR).collect()
    bb = new_fn(spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in bb], "OUTPUT DIVERGED"
    print("bit-identical at sf0.1:", len(a), "rows")

    # runtime reuse check: executed plan after collect
    df = new_fn(spark, SF_DIR)
    df.collect()
    ep = df._jdf.queryExecution().executedPlan().toString()
    print("runtime ReusedExchange/stage-reuse nodes:",
          ep.count("ReusedExchange") + ep.count("TableCacheQueryStage") )
    # count how many times the Generate (explode) appears in the FINAL plan
    print("Generate nodes in final plan:", ep.count("Generate"))

    # interleaved timings
    for fn, name in ((old_dsir, "old"), (lambda s, d: new_fn(s, d), "new")):
        _force(fn(spark, SF_DIR))  # warm
    ts = {"old": [], "new": []}
    for i in range(5):
        for name, fn in (("old", old_dsir), ("new", new_fn)) if i % 2 == 0 else (("new", new_fn), ("old", old_dsir)):
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            ts[name].append(time.perf_counter() - t0)
    for n, v in ts.items():
        print(f"{n}: median {statistics.median(v):.3f} min {min(v):.3f} max {max(v):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
