#!/usr/bin/env python
"""A/B: merge-only table (NO DVs) — all-native CDF vs DataSource."""
import statistics, sys, tempfile, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent))
SF_DIR = "/root/testdata/sf0.1"

def _force(df): df.write.format("noop").mode("overwrite").save()

def main():
    from pyspark.sql import functions as F
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.session import get_spark
    from duck_delta_share_spark.sources.delta_log import merge_delta, read_delta_changes, write_delta
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark = get_spark(app_name="r13-ab-cdf2")
    spark.sparkContext.setLogLevel("ERROR")
    t = Path(tempfile.mkdtemp(prefix="r13_cdf2_")) / "t"
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_acctbal")
    write_delta(c.repartition(4), t)
    merge_delta(spark, t, c.where("c_custkey % 7 = 0").select(
        "c_custkey", (F.col("c_acctbal") + 100.0).alias("c_acctbal")), ["c_custkey"])
    merge_delta(spark, t, c.where("c_custkey % 14 = 0").select(
        "c_custkey", (F.col("c_acctbal") + 200.0).alias("c_acctbal")), ["c_custkey"])
    spark.dataSource.register(DeltaShareDataSource)

    def old():
        return (spark.read.format("deltashare").option("deltaPath", str(t))
                .option("readChangeFeed", "true").option("startingVersion", "0").load())
    def new():
        return read_delta_changes(spark, t, 0)

    a = sorted(tuple(r) for r in old().collect())
    b = sorted(tuple(r) for r in new().collect())
    assert a == b, "DIVERGED"
    print(f"identical: {len(a)} rows")
    for f in (old, new): _force(f())
    ts = {"old": [], "new": []}
    for i in range(7):
        order = (("old", old), ("new", new)) if i % 2 == 0 else (("new", new), ("old", old))
        for name, f in order:
            t0 = time.perf_counter(); _force(f()); ts[name].append(time.perf_counter() - t0)
    for n, v in ts.items():
        print(f"{n}: median {statistics.median(v):.3f} min {min(v):.3f} max {max(v):.3f}")
    spark.stop()

if __name__ == "__main__":
    main()
