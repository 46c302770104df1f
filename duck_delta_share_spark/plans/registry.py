"""Registry mapping query names → (Spark impl, DuckDB oracle SQL).

Contract (driver, __spark_entry__.py): the Spark impl takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL runs on DuckDB
views with the same table names. Column names/aliases MUST match — the
driver sorts columns by name before value-hashing.

Float discipline (SURVEY.md §7 "oracle-exact semantics"): any aggregate over
doubles is computed by casting the addend to an exact DECIMAL and summing —
decimal addition is associative, so the result is identical regardless of
Spark partitioning or DuckDB vector order — then cast back to DOUBLE for a
stable output schema. Helpers below implement this on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SparkQuery = Callable[[SparkSession, str], DataFrame]

# Addend type for exact sums: 2-decimal money values and their small products
# fit comfortably (addend bound 1e12); the sum widens precision by 10
# internally on both engines. Precision 18 on purpose: Spark keeps ≤18-digit
# decimals Long-backed (no BigDecimal allocation per row on the cast path),
# ~15-20% faster on agg-heavy plans, and the rounding (scale 6, half-up) is
# identical to the wider type — so oracle values are unchanged even where an
# oracle hardcodes DECIMAL(27,6).
DEC = "decimal(18,6)"


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # None → driver runs rows-only check
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a query implementation (+ optional oracle)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryDef(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Exact-aggregation helpers (Spark side). Oracle SQL mirrors these textually.
# ---------------------------------------------------------------------------

def dsum(col: Column | str, scale: str = DEC) -> Column:
    """Order-independent sum of a double expression: exact decimal sum,
    emitted as double. Stays entirely in whole-stage codegen (no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")


def davg(col: Column | str, scale: str = DEC) -> Column:
    """Order-independent mean: exact decimal sum → double, divided by the
    exact count. Single IEEE division → identical on Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: str = DEC) -> str:
    """DuckDB rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS {scale.upper()})) AS DOUBLE)"


def sql_davg(expr: str, scale: str = DEC) -> str:
    """DuckDB rendering of :func:`davg`."""
    return f"CAST(SUM(CAST(({expr}) AS {scale.upper()})) AS DOUBLE) / COUNT({expr})"
