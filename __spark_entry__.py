"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``duck_delta_share_spark`` (blueprint: SURVEY.md);
this module only adapts the plans registry to the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable regardless of the driver's CWD.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the session settings our plans assume (oracle parity + scale
    posture) to a driver-provided SparkSession."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from duck_delta_share_spark.plans import QUERIES

    _configure(spark)
    return QUERIES["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2. The per-round
    window rotation (the driver's correctness gate covers the FIRST 50
    entries) lives in ``duck_delta_share_spark/plans/__init__.py``
    (``_R{N}_WINDOW list in plans/__init__.py (rotated each round)``) — registry order IS the driver order."""
    from duck_delta_share_spark.plans import QUERIES

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: _wrap(qd.spark_fn) for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops)."""
    from duck_delta_share_spark.plans import QUERIES

    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
