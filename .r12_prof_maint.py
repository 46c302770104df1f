#!/usr/bin/env python
"""Profile maintain_dedup_store internals on tables shaped like the
incremental_dedup_maintained query's store/corpus at sf0.1."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from duck_delta_share_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="r12profm")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from duck_delta_share_spark.catalog import load_table  # noqa: E402
from duck_delta_share_spark.functions.text import fingerprint  # noqa: E402
from duck_delta_share_spark.operators import dedup as dd  # noqa: E402
from duck_delta_share_spark.operators.dedup import incremental_dedup_commit  # noqa: E402
from duck_delta_share_spark.plans.llm_ops import _scratch_dir  # noqa: E402
from duck_delta_share_spark.sources.delta_log import (  # noqa: E402
    checkpoint,
    optimize,
    vacuum,
    write_delta,
)

SF = "/root/testdata/sf0.1"

for rep in range(2):
    d = load_table(spark, SF, "documents").where(F.col("text").isNotNull())
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    d = d.select("doc_id", "lang", "source", "text", bucket.alias("__bucket"))
    hist = d.where(F.col("__bucket") < 60).drop("__bucket")
    s1 = d.where((F.col("__bucket") >= 60) & (F.col("__bucket") < 80)).drop("__bucket")
    base = _scratch_dir("profmaint")
    corpus, store = base / "corpus", base / "fps"
    seed = dd.exact_dedup(hist, "text", "doc_id")
    write_delta(seed, corpus)
    write_delta(seed.select(fingerprint("text").alias("fp"), "doc_id"), store)
    incremental_dedup_commit(spark, s1, corpus, store, "loader", 1)

    for tag, tbl in (("store", store), ("corpus", corpus)):
        nfiles = len(list(Path(tbl).glob("*.parquet")))
        t0 = time.perf_counter()
        o = optimize(spark, tbl)
        t1 = time.perf_counter()
        ck = checkpoint(tbl)
        t2 = time.perf_counter()
        v = vacuum(tbl, retain_hours=168.0)
        t3 = time.perf_counter()
        print(
            f"rep{rep} {tag}: files={nfiles} optimize {t1-t0:.2f}s "
            f"({o['files_before']}->{o['files_after']}) "
            f"checkpoint {t2-t1:.2f}s vacuum {t3-t2:.2f}s"
        )
spark.stop()
