#!/usr/bin/env python
"""Phase profiler for incremental_dedup_maintained at sf0.1."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from duck_delta_share_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="r12prof")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from duck_delta_share_spark.catalog import load_table  # noqa: E402
from duck_delta_share_spark.functions.text import fingerprint  # noqa: E402
from duck_delta_share_spark.operators import dedup as dd  # noqa: E402
from duck_delta_share_spark.operators.dedup import (  # noqa: E402
    incremental_dedup_commit,
    maintain_dedup_store,
)
from duck_delta_share_spark.plans.llm_ops import _scratch_dir  # noqa: E402
from duck_delta_share_spark.sources.delta_log import read_delta, write_delta  # noqa: E402

SF = "/root/testdata/sf0.1"

for rep in range(2):
    t_all = time.perf_counter()
    marks = []

    def mark(label):
        marks.append((label, time.perf_counter()))

    d = load_table(spark, SF, "documents").where(F.col("text").isNotNull())
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    d = d.select("doc_id", "lang", "source", "text", bucket.alias("__bucket"))
    hist = d.where(F.col("__bucket") < 60).drop("__bucket")
    s1 = d.where((F.col("__bucket") >= 60) & (F.col("__bucket") < 80)).drop("__bucket")
    s2 = d.where(F.col("__bucket") >= 80).drop("__bucket")

    base = _scratch_dir("incmaint")
    corpus, store = base / "corpus", base / "fps"
    mark("setup")
    seed = dd.exact_dedup(hist, "text", "doc_id")
    write_delta(seed, corpus)
    mark("write corpus seed")
    write_delta(seed.select(fingerprint("text").alias("fp"), "doc_id"), store)
    mark("write store seed")
    incremental_dedup_commit(spark, s1, corpus, store, "loader", 1)
    mark("commit shard1")
    maintain_dedup_store(spark, store)
    mark("maintain store")
    maintain_dedup_store(spark, corpus)
    mark("maintain corpus")
    r1 = incremental_dedup_commit(spark, s2, corpus, store, "loader", 2)
    mark("commit shard2")
    r2 = incremental_dedup_commit(spark, s2, corpus, store, "loader", 2)
    mark("replay shard2 (no-op)")
    final = read_delta(spark, corpus).select("doc_id", "lang", "source")
    fps = read_delta(spark, store)
    out = (
        final.join(fps, "doc_id")
        .select("doc_id", "lang", "source", "fp")
        .orderBy("doc_id")
    )
    out.write.format("noop").mode("overwrite").save()
    mark("final join + noop")
    prev = t_all
    print(f"--- rep {rep}: total {time.perf_counter()-t_all:.2f}s")
    for label, t in marks:
        print(f"  {t-prev:6.2f}s  {label}")
        prev = t
spark.stop()
