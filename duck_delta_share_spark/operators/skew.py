"""Skew-handling operators (SURVEY.md §7 "salted aggregations documented
per operator"; BASELINE.json 100 TB posture).

Hot keys are the classic 100 TB failure mode: one reducer gets the whale
key and the stage runs at the speed of that task. Two mitigations:

- ``salted_agg`` — two-phase aggregation: phase 1 aggregates on
  (key, salt) spreading each hot key over ``n_salts`` reducers; phase 2
  merges the ``n_salts`` partials per key. Correct for any aggregate with
  a merge function (here: count/sum/min/max). For uniform keys this costs
  one extra (tiny) shuffle of pre-aggregated partials — cheap insurance;
  for skewed keys it converts a stalled stage into an even one.
- ``broadcast_salted_join`` is NOT implemented by hand: Spark AQE
  (``spark.sql.adaptive.skewJoin.enabled``, on in session.py) splits skewed
  join partitions at runtime, which supersedes manual join salting for
  equi-joins. Use ``salted_agg`` only where the *aggregation itself* skews.

The salt is deterministic (hash of a stable id column, not rand()) so
results are reproducible run-to-run and the driver's value-hash holds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name → (phase1 aggregate over input rows,
    phase2 aggregate over the phase-1 partial, referencing the phase-1
    output name). Example::

        salted_agg(events, ["event_type"], {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total": (dsum("value"), F.sum("total")),
        }, salt_col="event_id")

    The phase-2 expression must be the MERGE of the phase-1 aggregate
    (sum of counts, sum of sums, min of mins, ...). Exact-decimal sums
    stay exact: decimal addition is associative across the two phases.
    """
    # pmod, not %: xxhash64 is signed and Spark's % follows the dividend's
    # sign, which would spread each key over up to 2*n_salts-1 partials
    # (the sibling salted_join already uses pmod)
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("__salt")
    phase1 = df.groupBy(*keys, salt).agg(
        *[a1.alias(name) for name, (a1, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[a2.alias(name) for name, (_, a2) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-mitigating equi-join: the BIG side gets a per-row salt (hash
    of ``salt_on``, default: all its columns — identical rows may share a
    salt, they are interchangeable), the SMALL side replicates
    ``n_salts``× , and the join key becomes (keys…, salt) — one hot key's
    rows now spread over ``n_salts`` shuffle partitions instead of one
    straggler. Semantically IDENTICAL to ``big.join(small, on, how)``;
    use when the small side is too big to broadcast and AQE's skew split
    (which only splits at sorted-merge boundaries) isn't enough.

    Replication cost: |small| × n_salts shuffle rows — the standard
    trade (Spark AQE docs; Beam/Flink call it key salting).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(on)
    salt_src = [F.col(c) for c in (salt_on or big.columns)]
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)).cast("int")
    )
    s = small.join(
        F.broadcast(
            b.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        ),
        how="cross",
    )
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")
