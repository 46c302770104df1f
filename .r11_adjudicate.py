#!/usr/bin/env python
"""r11 adjudication of the r10 bench drift set (VERDICT r10 item 1).

Isolated median-of-5 for the five queries that read >=1.4x in
BENCH_r10.json, on an otherwise-idle box, one session, rounds
interleaved (query order rotates per round so slow-JIT / GC phases
spread evenly — the CLAUDE.md single-session interleaved discipline).
Compares against BENCH_BASELINE.json and prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

TARGETS = [
    "similarity_ann_ivfpq",
    "mad_outlier_profile",
    "char_entropy_quality",
    "split_leakage_audit",
    "table_profile",
]
ROUNDS = 5
SF_DIR = "/root/testdata/sf0.1"


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from duck_delta_share_spark.plans import QUERIES
    from duck_delta_share_spark.session import get_spark

    spark = get_spark(app_name="r11-adjudicate")
    base = json.load(open(Path(__file__).parent / "BENCH_BASELINE.json"))[
        "queries"
    ]

    # warmup: one untimed pass
    for name in TARGETS:
        _force(QUERIES[name].spark_fn(spark, SF_DIR))

    times: dict[str, list[float]] = {n: [] for n in TARGETS}
    for r in range(ROUNDS):
        order = TARGETS[r % len(TARGETS):] + TARGETS[: r % len(TARGETS)]
        for name in order:
            df = QUERIES[name].spark_fn(spark, SF_DIR)
            t0 = time.time()
            _force(df)
            times[name].append(time.time() - t0)

    out = {}
    for name in TARGETS:
        med = statistics.median(times[name])
        out[name] = {
            "median": round(med, 3),
            "all": [round(t, 3) for t in times[name]],
            "baseline": base[name],
            "ratio": round(med / base[name], 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
