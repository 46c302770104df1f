#!/usr/bin/env python
"""Interleaved A/B: dsir_importance_weights old (3-pass) vs new (1-pass
window) in ONE session, median-of-5, plus bit-exact result comparison."""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = "/root/testdata/sf0.1"

from duck_delta_share_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="r12ab_dsir")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from duck_delta_share_spark.functions.text import tokenize, word_shingles  # noqa: E402
from duck_delta_share_spark.catalog import load_table  # noqa: E402


def _bucketed(sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tok = d.select("doc_id", "lang", tokenize("text").alias("__toks"))
    toks = tok.select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(F.col("__toks"), word_shingles(F.col("__toks"), 2))
        ).alias("term"),
    )
    return toks.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("term"), 1, 7), 16, 10).cast("long") % 4096
        ).alias("bucket"),
    )


def old(sf_dir):
    b = _bucketed(sf_dir)
    raw = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("qc"))
    tgt = (
        b.where(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    ratio = raw.join(tgt, "bucket", "left").select(
        "bucket",
        F.floor(
            (F.coalesce(F.col("tc"), F.lit(0)) + 1)
            * F.lit(1000000.0)
            / (F.col("qc") + 1)
        )
        .cast("long")
        .alias("ratio_e6"),
    )
    return (
        b.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("ratio_e6").cast("long").alias("dsir_score"),
        )
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(100)
    )


def new(sf_dir):
    b = _bucketed(sf_dir)
    g = b.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum((F.col("lang") == "en").cast("long")).alias("ek"),
    )
    bw = Window.partitionBy("bucket")
    scored = g.select(
        "doc_id",
        "k",
        F.floor(
            (F.coalesce(F.sum("ek").over(bw), F.lit(0)) + 1)
            * F.lit(1000000.0)
            / (F.sum("k").over(bw) + 1)
        )
        .cast("long")
        .alias("ratio_e6"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_terms"),
            F.sum(F.col("k") * F.col("ratio_e6")).cast("long").alias("dsir_score"),
        )
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(100)
    )


def _force(df):
    df.write.format("noop").mode("overwrite").save()


# result identity first, at sf0.01 AND sf0.1
for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    a = [tuple(r) for r in old(sf).collect()]
    n = [tuple(r) for r in new(sf).collect()]
    assert a == n, f"MISMATCH at {sf}: {a[:3]} vs {n[:3]}"
    print(f"identical at {sf}: {len(a)} rows")

for fn in (old, new):  # warmup
    _force(fn(SF_DIR))
res: dict[str, list[float]] = {"old": [], "new": []}
for _ in range(5):
    for tag, fn in (("old", old), ("new", new)):
        spark.sparkContext.setJobDescription(f"dsir:{tag}")
        t0 = time.perf_counter()
        _force(fn(SF_DIR))
        res[tag].append(time.perf_counter() - t0)
for tag, ts in res.items():
    print(
        f"{tag}: median {statistics.median(ts):.3f}s "
        f"min {min(ts):.3f} max {max(ts):.3f}"
    )
spark.stop()
