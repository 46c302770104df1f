"""Incremental view maintenance over a change data feed.

``apply_changes_to_rollup`` advances a keyed COUNT/SUM rollup using only
the CDF rows of the commits since the rollup was built — the materialized-
view refresh pattern that turns an O(table) recompute into O(changes):

- inserts / update_postimages contribute +1 / +value,
- deletes / update_preimages contribute -1 / -value,
- the signed per-key deltas (one small aggregation over the CDF batch)
  FULL OUTER join the previous rollup; keys whose count reaches zero drop
  out.

Only self-invertible aggregates (count, sum, and anything derived from
them: avg = sum/count) can be maintained this way — min/max need full
state and are deliberately not offered. Sums use the registry's exact
decimal discipline, so the incrementally-maintained rollup is
BIT-IDENTICAL to a from-scratch recompute (decimal addition is
associative and invertible), which the oracle query checks.

At 100 TB the win is the input size: a daily refresh reads the day's CDF
(GBs), not the table (TBs); the join touches only changed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duck_delta_share_spark.plans.registry import DEC


def rollup_from_scratch(
    df: DataFrame, keys: Sequence[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Baseline rollup: count + exact decimal sums per key. ``sum_cols``
    maps output name → input column."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.col(src).cast(DEC)).alias(out) for out, src in sum_cols.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def apply_changes_to_rollup(
    prev: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sum_cols: dict[str, str],
) -> DataFrame:
    """Advance ``prev`` (shaped like ``rollup_from_scratch`` output) with a
    CDF batch carrying ``_change_type``. Returns the new rollup."""
    ks = list(keys)
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), F.lit(1))
        .when(F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    delta_aggs = [F.sum(sign).alias("__dn")] + [
        F.sum((sign * F.col(src)).cast(DEC)).alias(f"__d_{out}")
        for out, src in sum_cols.items()
    ]
    deltas = changes.groupBy(*ks).agg(*delta_aggs)

    def _sum_merge(out: str):
        # SUM over an all-NULL key is NULL, not 0 — keep NULL when BOTH
        # sides are NULL so a key inserted with only NULL values matches
        # rollup_from_scratch bit-for-bit. (Residual edge, documented: if
        # every non-NULL row of a key is later deleted while NULL rows
        # remain, the maintained sum is 0 where a recompute says NULL —
        # resolving that needs a per-key non-null count, i.e. more state
        # than the rollup shape carries.)
        p, d = F.col(out), F.col(f"__d_{out}")
        return (
            F.when(p.isNull() & d.isNull(), F.lit(None).cast(DEC))
            .otherwise(
                F.coalesce(p, F.lit(0).cast(DEC)) + F.coalesce(d, F.lit(0).cast(DEC))
            )
            .alias(out)
        )

    merged = prev.join(deltas, ks, "full_outer").select(
        *ks,
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))).alias("n"),
        *[_sum_merge(out) for out in sum_cols],
    )
    return merged.filter(F.col("n") > 0)
