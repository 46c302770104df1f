#!/usr/bin/env python
"""r13 optimization harness: isolate queries with the noop sink, capture
formatted plans, and run interleaved A/B timings in ONE session (the
bm25-r9 adjudication rule).

Usage:
  python .r13_tools.py explain  q1 q2 ...      # plans/r13/<q>_<tag>.txt
  python .r13_tools.py time     q1 q2 ...      # median-of-5 noop timings
  python .r13_tools.py jobs     q1             # job/stage counts via listener

Env: R13_TAG=before|after (explain filename suffix), R13_RUNS=5,
SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (session.get_spark defaults).
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("R13_TAG", "before")
RUNS = int(os.environ.get("R13_RUNS", "5"))
OUT = Path(__file__).resolve().parent / "plans" / "r13"


def _spark():
    from duck_delta_share_spark.session import get_spark

    return get_spark(app_name="r13tools")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cmd, names = sys.argv[1], sys.argv[2:]
    from duck_delta_share_spark.plans import QUERIES

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda x: x, LongType())
    spark.range(32).select(warm("id")).count()

    if cmd == "explain":
        OUT.mkdir(parents=True, exist_ok=True)
        import contextlib
        import io

        for name in names:
            df = QUERIES[name].spark_fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
            p = OUT / f"{name}_{TAG}.txt"
            p.write_text(txt)
            print(f"wrote {p} ({len(txt.splitlines())} lines)")
    elif cmd == "time":
        results = {}
        for name in names:  # warmup pass, untimed
            spark.sparkContext.setJobDescription(f"warm:{name}")
            _force(QUERIES[name].spark_fn(spark, SF_DIR))
        for _ in range(RUNS):
            for name in names:
                spark.sparkContext.setJobDescription(f"time:{name}")
                t0 = time.perf_counter()
                _force(QUERIES[name].spark_fn(spark, SF_DIR))
                results.setdefault(name, []).append(time.perf_counter() - t0)
        for name, ts in results.items():
            print(
                f"{name}: median {statistics.median(ts):.3f}s "
                f"min {min(ts):.3f} max {max(ts):.3f} (n={len(ts)})"
            )
    elif cmd == "jobs":
        sc = spark.sparkContext
        tracker = sc.statusTracker()
        before_ids = set(tracker.getJobIdsForGroup() or [])
        name = names[0]
        _force(QUERIES[name].spark_fn(spark, SF_DIR))
        after_ids = set(tracker.getJobIdsForGroup() or [])
        print(f"{name}: {len(after_ids - before_ids)} jobs")
    else:
        raise SystemExit(f"unknown cmd {cmd}")
    spark.stop()


if __name__ == "__main__":
    main()
