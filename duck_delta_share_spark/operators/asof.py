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
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Inclusive as-of join. ``direction='backward'`` matches the latest
    right row with right.ts <= left.ts; ``'forward'`` the earliest with
    right.ts >= left.ts. ``tolerance_seconds`` nulls matches farther than
    the window (exact timestamp-interval arithmetic, no truncation).

    ``on`` must name the key column in BOTH frames. Returns all ``left``
    columns plus ``value_alias`` (null when no matching right row exists).
    Plan shape is unchanged by direction/tolerance: one shuffle on the
    key, per-partition sort, a single carried struct — never a range
    cross product.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    payload = list(left.columns)
    rv_type = right.schema[right_value].dataType
    # tie-breaking: the right row must fall INSIDE the frame at equal ts —
    # backward frames look back (right sorts first), forward frames look
    # ahead (right sorts after the left row)
    left_side, right_side = (1, 0) if direction == "backward" else (0, 1)

    lhs = left.select(
        *payload,
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
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
        F.lit(right_side).alias("__side"),
        F.col(right_value).alias("__rv"),
        # a NULL right timestamp can never satisfy right.ts <= left.ts (or
        # >=): drop it, or ASC NULLS FIRST would sort it to the partition
        # head and backward mode would carry its value onto every left row
        # preceding the first real right row (DuckDB ASOF never matches
        # NULL timestamps)
    ).filter(F.col("__ts").isNotNull())

    from pyspark.sql.types import MapType

    # deterministic tie-break among right rows sharing (key, ts): order by
    # the carried value too (shuffle fetch order is nondeterministic and
    # last()/first() would otherwise flicker run-to-run); maps aren't
    # orderable — such ties stay engine-ordered
    tie = [] if isinstance(rv_type, MapType) else [F.col("__rv")]
    base = Window.partitionBy(on).orderBy(F.col("__ts"), F.col("__side"), *tie)
    carried = F.struct(F.col("__ts").alias("mts"), F.col("__rv").alias("mrv"))
    is_right = F.col("__side") == F.lit(right_side)
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        match = F.last(F.when(is_right, carried), ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        match = F.first(F.when(is_right, carried), ignorenulls=True).over(w)

    out = lhs.unionByName(rhs).withColumn("__m", match).filter(
        F.col("__side") == left_side
    )
    # a NULL LEFT timestamp matches nothing either (it sorts to the
    # partition head, where forward mode would otherwise "match" the
    # earliest right row)
    value = F.when(F.col("__ts").isNotNull(), F.col("__m.mrv"))
    if tolerance_seconds is not None:
        bound = F.expr(f"interval {int(tolerance_seconds)} seconds")
        in_window = (
            F.col("__m.mts") >= F.col("__ts") - bound
            if direction == "backward"
            else F.col("__m.mts") <= F.col("__ts") + bound
        )
        value = F.when(in_window, value)
    return out.select(*payload, value.alias(value_alias))
