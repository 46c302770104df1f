"""Local-catalog loader for the driver's synthetic tables (TESTDATA.md).

The reference scans shared Delta tables file-by-file
(``/root/reference/src/duck_delta_share_extension.cpp:547-629``); here the
equivalent "already-materialized" path is a plain ``spark.read.parquet`` —
Catalyst gets full pushdown/pruning for free. The Delta-Sharing (presigned
URL) path lives in ``sources/delta_share.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Parquet → Catalyst handles column pruning
    and filter pushdown (verify with .explain: PushedFilters / ReadSchema).

    ``events.ts`` is parquet TIMESTAMP(NANOS), illegal for Spark's vectorized
    reader; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as
    long nanoseconds, which we floor to microseconds — exactly what DuckDB's
    ns→µs TIMESTAMP read does, keeping oracle values identical.
    """
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # floor division, not `div` (which truncates toward zero): pre-1970
        # nanosecond values must round DOWN by 1µs to match DuckDB's ns→µs
        # floor. (ts - pmod(ts, 1000)) is an exact multiple of 1000, so the
        # div is exact — no double-precision detour for int64 nanoseconds.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000")).cast(
                "timestamp_ntz"
            ),
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every synthetic table; optionally register temp views so the
    same names work from ``spark.sql`` (mirrors the DuckDB oracle setup)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
