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
    session starts when the gap to the previous event EXCEEDS
    ``gap_seconds`` (strict >).

    Strictness matches Spark's ``session_window`` semantics: an event at
    exactly ``last + gap`` MERGES into the session (probed empirically —
    events at 12:00 and 12:30 under a 30-minute gap are ONE session; the
    adjacent half-open windows [12:00,12:30) and [12:30,13:00) coalesce).
    The pre-r8 ``>=`` rule here split at the exact boundary and silently
    diverged from the native streaming twin on tie-heavy grids (r8
    streaming fuzz, ties seed).

    Gaps are measured in exact MICROSECONDS (``unix_micros``), matching the
    stateful streaming twin (``streaming/sessions.py`` compares ``gap_us``).
    The pre-r9 shape truncated to whole seconds (``cast('long')``), so an
    event at ``last + gap + 0.5s`` merged in batch but split in the twin
    (r8 ADVICE); sub-second timestamps now agree bit-for-bit.
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # int() AFTER the multiply: a fractional gap (the annotation is not
    # enforced) must truncate the same way the stateful twin's
    # `gap_seconds * 1_000_000` computes, not collapse to 0 (r9 review)
    gap_us = int(gap_seconds * 1_000_000)
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    flagged = events.withColumn(
        "__new_session",
        F.when(
            F.lag(ts_us).over(w).isNull() | ((ts_us - F.lag(ts_us).over(w)) > gap_us),
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
    partition_cols: Sequence[str] | None = None,
    num_range_partitions: int | None = None,
):
    """Contiguous-greedy sequence packing: assign documents (in stable
    ``id_col`` order) to training bins of ~``capacity_tokens`` tokens.
    ``bin_id = floor(start_offset / capacity)`` where start_offset is the
    exclusive running token total — a document lands in the bin where it
    begins, so each bin holds ≤ capacity + one boundary document. This is
    the deterministic approximation of first-fit packing used for LLM
    batch assembly (exact bin packing is NP-hard and order-dependent;
    contiguous fill keeps results reproducible).

    Two scale-safe execution modes (neither ever funnels the table
    through a single task):

    - ``partition_cols`` given: pack independently WITHIN each partition
      (date/source/lang) — the window partitions by those columns, bins
      are per-partition. This is the 100 TB default: one hash shuffle,
      per-key sorts only.
    - global order (``partition_cols=None``): two-pass distributed prefix
      sum. Pass 1 range-partitions on ``id_col`` and computes per-range
      token totals (a handful of rows — control-plane only, like the
      connected-components iteration driver). Pass 2 windows WITHIN each
      range partition and adds the broadcast exclusive prefix offset of
      its range. Output is bit-identical to a global-order running sum,
      but every window task holds one range, not the whole table.

    Output: (partition_cols..., doc_id, n_tokens, bin_id, bin_offset).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duck_delta_share_spark.functions.text import token_count

    toks = token_count_col if token_count_col is not None else token_count("text")

    def _finish(df, part_cols, end_col):
        start = F.col(end_col) - F.col("n_tokens")
        return df.select(
            *part_cols,
            id_col,
            "n_tokens",
            F.floor(start / capacity_tokens).cast("int").alias("bin_id"),
            start.cast("long").alias("bin_offset"),
        )

    if partition_cols:
        part = list(partition_cols)
        with_tok = docs.select(*part, F.col(id_col), toks.alias("n_tokens"))
        w = (
            Window.partitionBy(*part)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return _finish(with_tok.withColumn("__end", F.sum("n_tokens").over(w)), part, "__end")

    spark = docs.sparkSession
    n = num_range_partitions or spark.sparkContext.defaultParallelism
    with_tok = docs.select(F.col(id_col), toks.alias("n_tokens"))
    # Deterministic range assignment: boundaries are sampled ONCE on the
    # driver (bounded ~200·n ids — control plane) and baked into the plan
    # as LITERALS, so both passes (and any recompute) assign identical
    # range ids. The previous shape used repartitionByRange +
    # spark_partition_id, whose boundary sampling is seeded from the RDD
    # id (varies per job) — it had to pin the whole projection in cache
    # across the call boundary to keep the passes consistent, leaking a
    # corpus-sized persisted frame per call.
    boundaries: list = []
    ranged_src = with_tok
    cache_handle = None
    if n > 1:
        # ONE evaluation of the (possibly expensive) upstream lineage:
        # persist the NARROW (id, n_tokens) projection — the boundary
        # sample, pass-1 totals and pass-2 window all read it (without
        # this, a pack after a dedup→filter pipeline re-runs that whole
        # lineage three times — measured 3.2x on the e2e capstone).
        # Unlike the old repartitionByRange shape, CORRECTNESS no longer
        # depends on cache retention: literal boundaries make any
        # recompute assign identical range ids, so eviction costs time,
        # not consistency. The cache is ~16 bytes/doc, not the corpus;
        # callers that pack repeatedly in one session can release it via
        # the returned frame's `_pack_sequences_cache.unpersist()`.
        cache_handle = with_tok.persist()
        ranged_src = cache_handle
        n_rows = ranged_src.count()
        if n_rows:
            frac = min(1.0, (n * 200) / n_rows)
            ids = sorted(
                r[0]
                for r in ranged_src.select(id_col)
                .sample(fraction=frac, seed=41)
                .collect()
                if r[0] is not None
            )
            for i in range(1, n):
                if ids:
                    b = ids[min(len(ids) - 1, (len(ids) * i) // n)]
                    if not boundaries or b != boundaries[-1]:
                        boundaries.append(b)
    if boundaries:
        barr = F.array(*[F.lit(b) for b in boundaries])
        pid = F.size(F.filter(barr, lambda b: F.col(id_col) >= b))
    else:
        pid = F.lit(0)
    ranged = ranged_src.withColumn("__pid", pid)
    # Pass 1: per-range totals -> exclusive prefix offsets. ≤ n rows cross the
    # driver (control plane, not data plane).
    totals = {
        r["__pid"]: r["__tot"]
        for r in ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("__tot")).collect()
    }
    offsets, acc = [], 0
    for pid in range(max(totals, default=-1) + 1):
        offsets.append((pid, acc))
        acc += totals.get(pid, 0) or 0
    offset_df = spark.createDataFrame(
        offsets or [(0, 0)], "`__pid` INT, `__off` LONG"
    )
    # Pass 2: window within each range + broadcast-joined prefix offset.
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ranged.withColumn("__local_end", F.sum("n_tokens").over(w))
        .join(F.broadcast(offset_df), "__pid")
        .withColumn("__end", F.col("__local_end") + F.col("__off"))
    )
    result = _finish(out, [], "__end")
    if cache_handle is not None:
        # deterministic release hook for repeated in-session packing
        result._pack_sequences_cache = cache_handle
    return result
