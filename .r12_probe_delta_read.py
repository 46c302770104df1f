#!/usr/bin/env python
"""Measure the deltashare Python-DataSource boundary cost vs a native
parquet scan of the same active file set, interleaved in one session."""
from __future__ import annotations

import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from duck_delta_share_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="r12probe")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from duck_delta_share_spark.catalog import load_table  # noqa: E402
from duck_delta_share_spark.sources.delta_log import (  # noqa: E402
    read_delta,
    snapshot,
    write_delta,
)

SF = "/root/testdata/sf0.1"
base = Path(tempfile.mkdtemp(prefix="r12probe_"))

# corpus-shaped table (documents, ~5k rows with text) and a store-shaped
# table (16-byte fp + doc_id)
d = load_table(spark, SF, "documents").where(F.col("text").isNotNull())
corpus = base / "corpus"
store = base / "fps"
write_delta(d.select("doc_id", "lang", "source", "text"), corpus)
write_delta(d.select(F.md5("text").alias("fp"), "doc_id"), store)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def via_ds(path):
    return read_delta(spark, path)


def via_native(path):
    snap = snapshot(path)
    files = [f["url"] for f in snap.files]
    from duck_delta_share_spark.sources.schema import schema_from_string

    sch = schema_from_string(snap.schema_string)
    return spark.read.schema(sch).parquet(*files)


for tag, path in (("corpus", corpus), ("store", store)):
    a = via_ds(path)
    b = via_native(path)
    ca, cb = a.count(), b.count()
    assert ca == cb, (ca, cb)
    res: dict[str, list[float]] = {"ds": [], "native": []}
    for fn, key in ((via_ds, "ds"), (via_native, "native")):
        _force(fn(path))  # warm
    for _ in range(7):
        for key, fn in (("ds", via_ds), ("native", via_native)):
            t0 = time.perf_counter()
            _force(fn(path))
            res[key].append(time.perf_counter() - t0)
    for key, ts in res.items():
        print(
            f"{tag}/{key}: median {statistics.median(ts)*1000:.0f}ms "
            f"min {min(ts)*1000:.0f} max {max(ts)*1000:.0f}"
        )

# also: an agg on top (store anti-join shape)
import shutil  # noqa: E402

shutil.rmtree(base)
spark.stop()
