"""Gap-based sessionization over an event stream/table.

Not in the reference surface (it is a pure Delta Sharing scan client,
``/root/reference/src/duck_delta_share_extension.cpp:654-662``); this is one
of the driver-mandated pipeline operators (SURVEY.md §2C) expressed
Spark-first.

Scale notes (100 TB posture):
- One shuffle total: the ``lag``/cumulative-sum window partitions by the
  session key; the per-session rollup groups by ``(key, session_seq)`` —
  hash-partitioning on ``key`` already clusters those rows, so Catalyst
  plans the groupBy without a second exchange.
- Per-key state is a sort of that key's events only; skewed keys (one user
  with millions of events) are bounded by the window sort, not a cross
  product. For pathological keys, pre-split by day and merge sessions at
  day boundaries.
- The streaming twin (``streaming/sessions.py``) bounds state with a
  watermark instead of sorting history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duck_delta_share_spark.plans.registry import dsum

DEFAULT_GAP_SECONDS = 1800


def assign_sessions(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("ts", "event_id"),
) -> DataFrame:
    """Tag each event with a per-key ``session_seq`` (1-based): a new
    session starts when the gap to the previous event is >= ``gap_seconds``.

    Strictness matches Spark's ``session_window`` semantics (an event at
    exactly ``last + gap`` opens a new session), so the batch and streaming
    operators agree on boundaries.
    """
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    flagged = events.withColumn(
        "__new_session",
        F.when(
            F.lag(ts_s).over(w).isNull() | ((ts_s - F.lag(ts_s).over(w)) >= gap_seconds),
            1,
        ).otherwise(0),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        "session_seq", F.sum("__new_session").over(wc)
    ).drop("__new_session")


def sessionize(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Roll events up into one row per session:
    ``(key, session_seq, n_events, session_start, session_end, total_value)``.

    ``total_value`` uses the exact-decimal sum discipline so the result is
    partitioning-order independent (oracle-hashable).
    """
    tagged = assign_sessions(events, gap_seconds, key_col, ts_col)
    return tagged.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        dsum(value_col).alias("total_value"),
    )


def pack_sequences(
    docs,
    capacity_tokens: int = 256,
    id_col: str = "doc_id",
    token_count_col=None,
):
    """Contiguous-greedy sequence packing: assign documents (in stable
    ``id_col`` order) to training bins of ~``capacity_tokens`` tokens.
    ``bin_id = floor(start_offset / capacity)`` where start_offset is the
    exclusive running token total — a document lands in the bin where it
    begins, so each bin holds ≤ capacity + one boundary document. This is
    the deterministic, single-window-pass approximation of first-fit
    packing used for LLM batch assembly (exact bin packing is NP-hard and
    order-dependent; contiguous fill keeps results reproducible and the
    plan a single global-order window).

    Scale note: the running sum needs a GLOBAL order — one range-partition
    shuffle (Spark samples boundaries); at 100 TB pack within date/source
    partitions instead (add the partition column to the window spec).
    Output: (doc_id, n_tokens, bin_id, bin_offset).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duck_delta_share_spark.functions.text import token_count

    toks = token_count_col if token_count_col is not None else token_count("text")
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_tok = docs.select(F.col(id_col), toks.alias("n_tokens"))
    return (
        with_tok.withColumn("__end", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "n_tokens",
            F.floor((F.col("__end") - F.col("n_tokens")) / capacity_tokens)
            .cast("int")
            .alias("bin_id"),
            (F.col("__end") - F.col("n_tokens")).alias("bin_offset"),
        )
    )
