"""Exactly-once streaming writes into a local Delta table.

Structured Streaming's ``foreachBatch`` is at-least-once: after a crash
between the sink write and the checkpoint commit, the next run REPLAYS the
last micro-batch. The Delta protocol's answer is the SetTransaction
(``txn``) action — each batch commits atomically WITH its (appId,
batch_id) marker, so the replayed batch sees its own marker in the log and
skips. This is the same recipe delta-spark's streaming sink uses
(txnAppId/txnVersion); the reference has no write path at all
(duck_delta_share is read-only — src/delta_sharing_client.cpp).

Guarantees, in order of what fails:
- duplicate batch replay → skipped via ``last_txn_version``;
- crash between data-file staging and the log commit → staged files are
  orphans, never referenced (the commit is the only publish point);
- concurrent appends from other writers → the txn append retries under
  the optimistic O_EXCL race like any other append.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

from duck_delta_share_spark.sources.delta_log import last_txn_version, write_delta


def delta_batch_writer(
    table_path: str | Path,
    app_id: str,
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
):
    """The ``foreachBatch`` callable: idempotent txn-guarded append.

    COUPLING (same as delta-spark's txnAppId): batch ids are scoped to
    the streaming CHECKPOINT. If the checkpoint is recreated (corruption
    recovery, relocation) while ``app_id`` stays the same, the renumbered
    batches compare against the old marker and the whole backlog is
    skipped — a fresh checkpoint requires a fresh ``app_id`` (or
    clearing the marker). Skipped batches are logged loudly so this
    failure mode is visible instead of silent.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = last_txn_version(table_path, app_id)
        if batch_id <= marker:
            if batch_id < marker:
                # a crash replay is exactly batch_id == marker; STRICTLY
                # below means the batch numbering restarted — the
                # checkpoint was recreated with the same appId and the
                # backlog is being silently dropped
                import warnings

                warnings.warn(
                    f"delta sink skipped batch {batch_id} for appId "
                    f"{app_id!r} whose marker is at {marker}: batch "
                    "numbering restarted — if this stream got a NEW "
                    "checkpoint, use a fresh appId or the backlog is "
                    "dropped.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            return  # replayed micro-batch: already committed atomically
        write_delta(
            batch_df,
            table_path,
            mode="append",
            partition_by=partition_by,
            merge_schema=merge_schema,
            txn=(app_id, int(batch_id)),
        )

    return write_batch


def stream_to_delta(
    stream_df: DataFrame,
    table_path: str | Path,
    checkpoint_dir: str,
    app_id: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
    merge_schema: bool = False,
):
    """Run a streaming query that lands every micro-batch as one Delta
    commit carrying a SetTransaction marker; returns the StreamingQuery.

    With ``available_now`` the query drains the source and stops (the
    batch-refresh pattern); otherwise it runs until stopped.
    ``merge_schema`` lets a micro-batch that gained new columns evolve the
    table instead of failing the query (same semantics as write_delta).
    """
    writer = (
        stream_df.writeStream.foreachBatch(
            delta_batch_writer(table_path, app_id, partition_by, merge_schema)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
