"""Streaming SCD Type-2 dimension maintenance — the streaming twin of the
``scd2_dimension_cdf`` batch fold.

Shape: ``readStream`` of the source table's CDF (versions as offsets) →
``foreachBatch`` folds the batch's insert images into a versioned
dimension Delta table (key, value, valid_from, valid_to, is_current):

- file-rewrite no-op churn is collapsed BOTH within the batch
  (value = lag(value)) and against the dimension's current row — a merge
  that rewrote a file for other keys never opens a spurious version;
- a key changing several times inside one batch produces the full chain
  of intermediate rows (valid_to = next change's version);
- the upsert into the dimension is a file-granular ``merge_delta`` keyed
  on (key, valid_from): closing rows update in place, new versions
  insert. A replayed micro-batch (crash between the merge and the txn
  marker) reduces to an EMPTY fold — insert rows at versions the
  dimension's current row already covers are dropped up front — which is
  what makes ``foreachBatch``'s at-least-once delivery exactly-once
  here; a SetTransaction marker additionally short-circuits replays.

At 100 TB each epoch touches O(changed keys) dimension rows (stats-pruned
merge), never the base table.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _txn_app(dim_table: str | Path) -> str:
    # ":srcver" namespaces the marker SEMANTICS: the value is the max
    # folded SOURCE version (durable), not the checkpoint-scoped batch id
    # the pre-r5 marker stored. Reusing the old app id would compare a
    # version against a stale batch-id watermark — a batch-id marker
    # larger than the source's current version would silently drop every
    # future batch. Old-marker dimensions simply refold once under the
    # new id; the fold is replay-idempotent, so the migration is a no-op
    # merge.
    return f"scd2:srcver:{Path(dim_table).resolve()}"


def fold_scd2_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    dim_table: str | Path,
    key_col: str,
    value_col: str,
) -> None:
    """Apply one CDF micro-batch to the SCD2 dimension table."""
    from duck_delta_share_spark.sources.delta_log import (
        merge_delta,
        read_delta,
        write_delta,
    )

    inserts = batch_df.where(F.col("_change_type") == "insert").select(
        key_col, value_col, F.col("_commit_version").alias("__v")
    )
    dim_exists = (Path(dim_table) / "_delta_log").is_dir()
    if dim_exists:
        cur = (
            read_delta(spark, dim_table)
            .where("is_current = 1")
            .select(
                F.col(key_col),
                F.col(value_col).alias("__cur_val"),
                F.col("valid_from").alias("__cur_from"),
                F.lit(1).alias("__cur_present"),
            )
        )
    else:
        cur = (
            inserts.limit(0)
            .select(
                key_col,
                F.col(value_col).alias("__cur_val"),
                F.col("__v").alias("__cur_from"),
                F.lit(1).alias("__cur_present"),
            )
        )

    # Replay hardening (crash window between the merge and the txn
    # marker): drop insert rows the dimension already reflects
    # (__v <= current row's valid_from). A replayed batch then reduces to
    # an EMPTY fold — without this, a key that changed value twice in the
    # batch would, on replay, re-admit its earlier versions against the
    # already-advanced current row and emit a closing row sharing the
    # (key, valid_from) merge key with the re-derived current row.
    w = Window.partitionBy(key_col).orderBy("__v")
    cand = (
        inserts.join(cur, key_col, "left")
        .where(F.col("__cur_from").isNull() | (F.col("__v") > F.col("__cur_from")))
        .withColumn("__prev_val", F.lag(value_col).over(w))
        # presence flags, NOT value-null probes: both the previous row's
        # value and the dimension's current value may legitimately be
        # NULL, and NULL transitions must still fold (self-review r5 —
        # the old `!=` dropped value->NULL changes and misread a NULL
        # prev value as "no previous row")
        .withColumn("__has_prev", F.lag(F.lit(1)).over(w))
    )
    # a row opens a new version iff its value differs (NULL-SAFELY) from
    # the previous state: within-batch predecessor when there is one,
    # else the dimension's current value (absent row = genuinely new key)
    real = cand.where(
        (
            F.col("__has_prev").isNull()
            & (
                F.col("__cur_present").isNull()
                | ~F.col(value_col).eqNullSafe(F.col("__cur_val"))
            )
        )
        | (
            F.col("__has_prev").isNotNull()
            & ~F.col(value_col).eqNullSafe(F.col("__prev_val"))
        )
    ).select(key_col, value_col, "__v")
    w2 = Window.partitionBy(key_col).orderBy("__v")
    rows_new = real.select(
        F.col(key_col),
        F.col(value_col),
        F.col("__v").alias("valid_from"),
        F.lead("__v").over(w2).alias("valid_to"),
        F.lead("__v").over(w2).isNull().cast("int").alias("is_current"),
    )
    first_real = real.groupBy(key_col).agg(F.min("__v").alias("__first_v"))
    closings = (
        cur.join(first_real, key_col)
        .select(
            F.col(key_col),
            F.col("__cur_val").alias(value_col),
            F.col("__cur_from").alias("valid_from"),
            F.col("__first_v").alias("valid_to"),
            F.lit(0).alias("is_current"),
        )
    )
    updates = rows_new.unionByName(closings)
    # an effect-free batch (no inserts, pure churn, or a replay) must NOT
    # reach merge_delta: empty update bounds make stats_allow pass every
    # file and the merge would rewrite the ENTIRE dimension as remove+add
    # (self-review r5); the limit(1) probe is O(changes)
    if real.limit(1).count() == 0:
        return
    if not dim_exists:
        write_delta(updates, dim_table)
    else:
        merge_delta(spark, dim_table, updates, [key_col, "valid_from"])


def maintain_scd2_stream(
    spark: SparkSession,
    source_table: str | Path,
    dim_table: str | Path,
    key_col: str,
    value_col: str,
    checkpoint_path: str | Path,
    starting_version: int = 0,
):
    """Start the SCD2 maintenance stream; returns the StreamingQuery."""
    from duck_delta_share_spark.sources.delta_log import (
        last_txn_version,
        write_delta,
    )
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.dataSource.register(DeltaShareDataSource)
    app = _txn_app(dim_table)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        # the txn marker records the max folded SOURCE version, not the
        # Spark batch id: batch ids are CHECKPOINT-scoped and restart from
        # 0 when a checkpoint is recreated, so `batch_id <= marker` would
        # silently discard every pending source version forever after a
        # routine checkpoint-loss recovery. Source versions are durable
        # and monotone; a batch whose max version <= marker is a true
        # replay, and a partially-overlapping batch refolds idempotently
        # (the __cur_from guard drops already-reflected inserts).
        mv = batch_df.agg(F.max("_commit_version")).first()[0]
        if mv is None:
            return  # empty batch: nothing to fold, nothing to mark
        if int(mv) <= last_txn_version(dim_table, app):
            return  # replayed versions already folded (SetTransaction)
        fold_scd2_batch(spark, batch_df, dim_table, key_col, value_col)
        # marker commit: empty append carrying only the txn action — a
        # crash between the merge and this marker replays an IDEMPOTENT
        # merge, so exactly-once still holds
        write_delta(
            batch_df.limit(0).select(
                F.col(key_col),
                F.col(value_col),
                F.col("_commit_version").alias("valid_from"),
                F.col("_commit_version").alias("valid_to"),
                F.lit(0).alias("is_current"),
            ),
            dim_table,
            txn=(app, int(mv)),
        )

    changes = (
        spark.readStream.format("deltashare")
        .option("deltaPath", str(source_table))
        .option("readChangeFeed", "true")
        .option("startingVersion", str(starting_version))
        .load()
    )
    return (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(checkpoint_path))
        .start()
    )
