#!/usr/bin/env python
"""Interleaved A/B: int8 topk/range scorer expr vs arrow, ONE session."""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF = "/root/testdata/sf0.1"

from duck_delta_share_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="r12ab_int8")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from duck_delta_share_spark.catalog import load_table  # noqa: E402
from duck_delta_share_spark.operators import similarity as sim  # noqa: E402

e = load_table(spark, SF, "embeddings")


def topk(scorer):
    return sim.int8_topk(e, e.filter(F.col("vec_id") < 10), k=5, scorer=scorer)


def rng(scorer):
    return sim.int8_range_search(
        e, e.filter(F.col("vec_id") < 25), min_score_e6=300_000, scorer=scorer
    ).orderBy("query_id", "vec_id")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


for fn in (topk, rng):
    a = sorted(tuple(r) for r in fn("expr").collect())
    b = sorted(tuple(r) for r in fn("arrow").collect())
    assert a == b, f"{fn.__name__} MISMATCH: {a[:3]} vs {b[:3]}"
    print(f"{fn.__name__}: identical ({len(a)} rows)")

for fn in (topk, rng):
    for s in ("expr", "arrow"):
        _force(fn(s))  # warm
res: dict[str, list[float]] = {}
for _ in range(5):
    for fn in (topk, rng):
        for s in ("expr", "arrow"):
            key = f"{fn.__name__}/{s}"
            spark.sparkContext.setJobDescription(key)
            t0 = time.perf_counter()
            _force(fn(s))
            res.setdefault(key, []).append(time.perf_counter() - t0)
for key, ts in res.items():
    print(
        f"{key}: median {statistics.median(ts):.3f}s "
        f"min {min(ts):.3f} max {max(ts):.3f}"
    )
spark.stop()
