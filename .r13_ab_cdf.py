#!/usr/bin/env python
"""Interleaved A/B + identity: batch CDF via the Python DataSource vs
read_delta_changes' native fast path, on a cdc_replication-shaped table
(multi-file create + merge wave + DV delete — exercises add, remove AND
dv-masked files in one change set)."""
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
SF_DIR = "/root/testdata/sf0.1"


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyspark.sql import functions as F
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.session import get_spark
    from duck_delta_share_spark.sources.delta_log import (
        delete_where, merge_delta, read_delta_changes, write_delta,
    )
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark = get_spark(app_name="r13-ab-cdf")
    spark.sparkContext.setLogLevel("ERROR")
    src = Path(tempfile.mkdtemp(prefix="r13_cdf_")) / "src"
    c = load_table(spark, SF_DIR, "customer").where("c_custkey % 3 = 0").select(
        "c_custkey", "c_acctbal"
    )
    write_delta(c.repartition(3), src)
    merge_delta(
        spark, src,
        c.where("c_custkey % 5 = 0").select(
            "c_custkey", (F.col("c_acctbal") + 50.0).alias("c_acctbal")
        ),
        ["c_custkey"],
    )
    delete_where(spark, src, "c_acctbal < 0.0")
    spark.dataSource.register(DeltaShareDataSource)

    def old():
        return (
            spark.read.format("deltashare")
            .option("deltaPath", str(src))
            .option("readChangeFeed", "true")
            .option("startingVersion", "0")
            .load()
        )

    def new():
        return read_delta_changes(spark, src, 0)

    key = ["_commit_version", "_change_type", "c_custkey"]
    a = sorted(tuple(r) for r in old().collect())
    b = sorted(tuple(r) for r in new().collect())
    assert a == b, f"DIVERGED: {len(a)} vs {len(b)} rows; first diff: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None)
    )
    print(f"identical change rows incl _commit_timestamp: {len(a)}")

    for f in (old, new):
        _force(f())
    ts = {"old": [], "new": []}
    for i in range(7):
        order = (("old", old), ("new", new)) if i % 2 == 0 else (("new", new), ("old", old))
        for name, f in order:
            t0 = time.perf_counter()
            _force(f())
            ts[name].append(time.perf_counter() - t0)
    for n, v in ts.items():
        print(f"{n}: median {statistics.median(v):.3f} min {min(v):.3f} max {max(v):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
