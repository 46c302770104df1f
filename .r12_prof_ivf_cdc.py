#!/usr/bin/env python
"""Phase profile: similarity_ann_ivf_persisted and cdc_replication_e2e."""
from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pandas as pd  # noqa: F401
from pyspark.sql import functions as F

from duck_delta_share_spark.session import get_spark
from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators import similarity as sim

SF = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"  {label:28s} {time.perf_counter() - t0:6.3f}s")
    return out


def main():
    spark = get_spark(app_name="prof_ivf_cdc")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda x: x, LongType())
    spark.range(32).select(warm("id")).count()

    e = load_table(spark, SF, "embeddings")
    e.count()

    for rnd in range(2):
        print(f"== ivf_persisted round {rnd} ==")
        idx = Path(tempfile.mkdtemp(prefix="r12ivf_")) / "index"
        t("build_index", lambda: sim.ivf_build_index(spark, e, idx, dim=64, n_centroids=32))
        probe = t("probe_plan", lambda: sim.ivf_probe_index(
            spark, e.filter(F.col("vec_id") < 10), idx, k=5, n_probe=32
        ).select("query_id", "vec_id", "rk"))
        t("probe_exec", lambda: probe.write.format("noop").mode("overwrite").save())

    from duck_delta_share_spark.sources.delta_log import (
        apply_cdc_batch, delete_where, merge_delta, read_delta, write_delta)
    from duck_delta_share_spark.plans.datasource_queries import _register

    for rnd in range(2):
        print(f"== cdc_replication round {rnd} ==")
        base_dir = Path(tempfile.mkdtemp(prefix="r12cdc_"))
        src = base_dir / "src"
        c = load_table(spark, SF, "customer").where("c_custkey % 3 = 0").select(
            "c_custkey", "c_acctbal")
        t("write_src", lambda: write_delta(c.repartition(3), src))
        t("merge", lambda: merge_delta(
            spark, src,
            c.where("c_custkey % 5 = 0").select(
                "c_custkey", (F.col("c_acctbal") + 50.0).alias("c_acctbal")),
            ["c_custkey"]))
        t("delete_where", lambda: delete_where(spark, src, "c_acctbal < 0.0"))
        _register(spark)
        changes = t("cdf_plan", lambda: (
            spark.read.format("deltashare")
            .option("deltaPath", str(src))
            .option("readChangeFeed", "true")
            .option("startingVersion", "0").load()))
        tgt = base_dir / "tgt"
        t("apply_cdc", lambda: apply_cdc_batch(spark, tgt, changes, ["c_custkey"]))
        out = read_delta(spark, tgt).orderBy("c_custkey")
        t("final_read", lambda: out.write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    main()
