"""As-of join: for each left row, the most recent right row at-or-before its
timestamp, per key.

Spark has no ASOF JOIN primitive (DuckDB does; the reference's host engine
would use it). A range/cross join explodes at scale, so we use the classic
union + ordered-window technique:

1. union left and right rows into one keyed stream,
2. sort within each key by (ts, side) — side orders right rows first on
   timestamp ties, making the match inclusive (left.ts >= right.ts),
3. ``last(value, ignorenulls)`` over an unbounded-preceding row frame carries
   the latest right value forward onto each left row.

Cost: ONE shuffle on the key (same as any join), O(n log n) per-partition
sort, no intermediate blow-up — scales to 100 TB streams; skewed keys are
split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    value_alias: str = "asof_value",
) -> DataFrame:
    """Backward-looking inclusive as-of join (left.ts >= right.ts).

    ``on`` must name the key column in BOTH frames. Returns all ``left``
    columns plus ``value_alias`` (null when no earlier right row exists).
    """
    payload = list(left.columns)
    rv_type = right.schema[right_value].dataType

    lhs = left.select(
        *payload,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    rhs = right.select(
        F.col(on),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in payload
            if c != on
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_value).alias("__rv"),
    )

    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lhs.unionByName(rhs)
        .withColumn(value_alias, F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(*payload, value_alias)
    )
