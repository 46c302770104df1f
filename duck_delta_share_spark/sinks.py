"""Write path (sinks). The reference is a read-only client — it has no
write path anywhere in ``/root/reference/src`` (SURVEY.md §2B "Sinks") —
but an engine with "the same query capabilities" needs one to be usable as
a pipeline stage, so the standard Spark sink shapes are wrapped here with
the 100 TB discipline baked in:

- ``write_partitioned`` — hive-style ``partitionBy`` layout. Readers get
  partition pruning for free; writers avoid the many-small-files failure
  mode by pre-repartitioning on the partition columns (one task per
  partition-dir × shuffle-partition, not cores × partitions files).
- ``write_sorted`` — per-file sorted runs (``sortWithinPartitions``) so
  downstream range scans / merge joins read clustered data; parquet gets
  tight min/max row-group stats → better row-group pruning.
- ``write_bucketed`` — ``bucketBy`` table: co-locates join keys so
  repeated equi-joins/aggs on the key skip the shuffle entirely
  (`spark.sql.sources.bucketing.enabled`). This is the scale answer to
  "we join on this key every day".

All writers return the path/table for chaining. Formats: parquet default;
anything Spark supports via ``fmt=``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
    files_per_partition: int = 1,
    options: dict[str, str] | None = None,
) -> str:
    """Partitioned layout with small-file control: repartition on the
    partition columns first so each partition directory gets
    ``files_per_partition`` files instead of one per upstream task.
    ``options`` pass through to the writer (e.g. partitionOverwriteMode)."""
    from pyspark.sql import functions as F

    cols = list(partition_by)
    if files_per_partition > 1:
        # Salt the repartition key: N tasks (→ N files) per partition dir,
        # for partitions too large for a single writer task.
        salt = (F.rand(seed=42) * files_per_partition).cast("int")
        shaped = df.repartition(*cols, salt.alias("__salt"))
    else:
        shaped = df.repartition(*cols)
    writer = shaped.write.format(fmt).mode(mode)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.partitionBy(*cols).save(path)
    return path


def write_sorted(
    df: DataFrame,
    path: str,
    sort_by: Sequence[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> str:
    """Per-file sorted runs → tight parquet min/max stats, clustered reads."""
    df.sortWithinPartitions(*sort_by).write.format(fmt).mode(mode).save(path)
    return path


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int = 16,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> str:
    """Bucketed (and optionally sorted) table: equi-joins and aggregations
    on the bucket key between co-bucketed tables run shuffle-free. Bucket
    count should be sized so a bucket fits in one task's memory at the
    target scale. ``path`` makes it external (data at an explicit location
    instead of the session warehouse)."""
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *list(bucket_by))
    if sort_by:
        w = w.sortBy(*list(sort_by))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
    return table


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    num_files: int = 16,
    zorder: bool = False,
    mode: str = "overwrite",
    fmt: str = "parquet",
    clamp_quantiles: tuple[float, float] = (0.001, 0.999),
) -> str:
    """Cluster data across files so FILE-level min/max stats prune scans —
    the write-side half of data skipping (the read side is
    ``sources/pushdown.stats_allow`` / row-group pruning).

    - ``zorder=False`` (linear): ``repartitionByRange`` + per-file sort on
      the cluster keys. Files get disjoint ranges of the LEAD key — ideal
      skipping on it, none on the trailing keys.
    - ``zorder=True``: rows are ordered by the bit-interleaved Z-value of
      the (quantile-clamped, equi-width bucketized) cluster keys, so each
      file covers a small hyper-rectangle: EVERY cluster dimension prunes,
      at the cost of slightly wider per-dimension ranges than a linear
      sort's lead key. The standard multi-dimensional clustering answer
      (Morton order) for "we filter on x AND y, not always both".

    Scale shape: one range shuffle (``repartitionByRange`` samples instead
    of a global sort), bucket bounds from ``approxQuantile`` (driver holds
    2 doubles per column, never data), Z-values are pure codegen
    shift/and/or expressions. Z-ordering needs numeric/date/timestamp
    columns (strings would hash away the locality that makes it work).
    """
    cols = list(cluster_by)
    if not zorder:
        shaped = df.repartitionByRange(num_files, *cols).sortWithinPartitions(*cols)
        shaped.write.format(fmt).mode(mode).save(path)
        return path

    shaped = zorder_repartition(df, cols, num_files, clamp_quantiles)
    shaped.write.format(fmt).mode(mode).save(path)
    return path


def zorder_repartition(
    df: DataFrame,
    cluster_by: Sequence[str],
    num_files: int,
    clamp_quantiles: tuple[float, float] = (0.001, 0.999),
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Rows range-partitioned + sorted by the bit-interleaved Z-value of
    the cluster columns (quantile-clamped equi-width buckets; pure codegen
    shift/and/or). Shared by ``write_clustered`` and Delta ``optimize``
    ZORDER.

    ``partition_cols`` clusters WITHIN hive partitions: the range
    partitioning and in-task sort lead with the partition columns, so a
    downstream ``partitionBy`` write emits contiguous Morton ranges per
    partition directory instead of fanning every z-range task across all
    directories (Z-bucket bounds stay global — per-partition quantiles
    would multiply the driver's approxQuantile work for marginal
    tightening)."""
    from pyspark.sql import functions as F

    cols = list(cluster_by)
    bits = min(16, 63 // max(1, len(cols)))
    buckets = 1 << bits
    # Equi-width buckets between clamped quantiles: outliers saturate into
    # the edge buckets instead of stretching everyone else's range.
    numeric = [F.col(c).cast("double") for c in cols]
    lo_hi = (
        df.select(
            *[
                F.percentile_approx(n, F.lit(list(clamp_quantiles)), 10_000).alias(str(i))
                for i, n in enumerate(numeric)
            ]
        ).first()
    )
    z = F.lit(0).cast("long")
    for j, c in enumerate(numeric):
        lo, hi = (lo_hi[str(j)] or [0.0, 1.0])[0], (lo_hi[str(j)] or [0.0, 1.0])[1]
        if hi <= lo:
            hi = lo + 1.0
        q = F.least(
            F.lit(buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((c - F.lit(lo)) / F.lit(hi - lo) * buckets).cast("long"),
            ),
        )
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * len(cols) + j)
            )
    lead = [F.col(c) for c in (partition_cols or [])]
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, *lead, F.col("__z"))
        .sortWithinPartitions(*lead, "__z")
        .drop("__z")
    )


def compact_files(
    spark,
    path: str,
    target_file_mb: int = 128,
    partition_by: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> dict:
    """Small-file compaction: rewrite a (possibly partitioned) dataset so
    each output file is ~``target_file_mb`` — the lake-hygiene op every
    streaming/incremental sink eventually needs (thousands of KB-sized
    micro-batch files destroy scan throughput: per-file open cost and
    task-scheduling overhead dominate, and row-group stats fragment).

    Output file count = ceil(on-disk bytes / target): sized from the
    dataset's ACTUAL compressed footprint, not row counts, so it holds
    for any schema/compression ratio. Partitioned datasets re-shuffle on
    the partition columns (plus a salt when one partition needs multiple
    files) so each directory gets its share of the budget; unpartitioned
    data coalesces where possible (no shuffle) and falls back to a
    round-robin repartition only when the file count must GROW.

    The rewrite goes through a temp directory + atomic-ish swap so a
    failed compaction never destroys the source. Returns a stats dict
    {files_before, files_after, bytes}.
    """
    import math
    import shutil
    from pathlib import Path

    from pyspark.sql import functions as F

    root = Path(path)
    data_files = [
        p for p in root.rglob("*") if p.is_file() and not p.name.startswith(("_", "."))
    ]
    total_bytes = sum(p.stat().st_size for p in data_files)
    files_before = len(data_files)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.format(fmt).load(str(root))
    tmp = str(root.parent / (root.name + "__compacting"))
    if partition_by:
        n_parts = df.select(*partition_by).distinct().count()
        per_dir = max(1, math.ceil(n_out / max(n_parts, 1)))
        cols = [F.col(c) for c in partition_by]
        if per_dir > 1:
            cols.append((F.monotonically_increasing_id() % per_dir).alias("__salt"))
        shaped = df.repartition(*cols)
        shaped.write.format(fmt).mode("overwrite").partitionBy(*partition_by).save(tmp)
    else:
        shaped = df.coalesce(n_out) if n_out <= files_before else df.repartition(n_out)
        shaped.write.format(fmt).mode("overwrite").save(tmp)

    shutil.rmtree(root)
    Path(tmp).rename(root)
    files_after = len(
        [
            p
            for p in root.rglob("*")
            if p.is_file() and not p.name.startswith(("_", "."))
        ]
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }


def upsert_partitioned(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_by: Sequence[str],
    fmt: str = "parquet",
    max_literal_partitions: int = 512,
) -> dict:
    """Keyed upsert into a hive-partitioned dataset WITHOUT a table format:
    the merge-on-write primitive incremental pipelines need when the lake
    is plain parquet (no Delta/Iceberg available).

    Scale shape — the whole point is touching only the AFFECTED
    partitions, never rewriting the dataset:

    1. the updates' partition values are collected (small: one row per
       touched partition directory) and pushed as an IN filter on the
       existing data, so the read PRUNES to affected directories;
    2. existing rows losing to an update are removed with a broadcast-able
       LEFT ANTI join on the key;
    3. survivors ∪ updates are written back with DYNAMIC partition
       overwrite — untouched directories are never read or written.

    Requires every key to map to one partition (keys must not move between
    partition values; the standard lake-upsert contract). Returns
    {partitions_touched, rows_written}.
    """
    from pyspark.sql import functions as F

    part_cols = list(partition_by)
    keys = list(key_cols)
    # persisted: the distinct-partition frame is read up to three times
    # (cap probe, stats count, semi-join build) and its lineage is the
    # whole update batch; the try/finally starts HERE so a failure at
    # any later step (missing path, probe error) still unpersists it
    parts = updates.select(*part_cols).distinct().persist()
    merged = None
    try:
        # bounded driver collect: an update batch touching millions of
        # partition directories (badly-partitioned table, backfill
        # batch) must not materialize them all on the driver — and a
        # literal OR-chain over that many tuples blows up the ANALYZER
        # long before the driver heap does. Below the threshold, literal
        # predicates give scan-time directory pruning; above it, a
        # semi-join on the partition tuples keeps the plan O(#part_cols).
        touched = parts.limit(max_literal_partitions + 1).collect()
        existing = spark.read.format(fmt).load(path)
        if len(touched) <= max_literal_partitions:
            n_touched = len(touched)
            cond = None
            for row in touched:
                clause = None
                for c in part_cols:
                    # eqNullSafe, not ==: a NULL partition value compared
                    # with == is never true, so the existing rows of the
                    # NULL partition directory would be EXCLUDED from
                    # `kept` while the dynamic overwrite still rewrites
                    # that directory — silently deleting every
                    # pre-existing non-matching row
                    eq = F.col(c).eqNullSafe(F.lit(row[c]))
                    clause = eq if clause is None else (clause & eq)
                cond = clause if cond is None else (cond | clause)
            affected = (
                existing.filter(cond) if cond is not None else existing.limit(0)
            )
        else:
            n_touched = parts.count()
            e, p = existing.alias("__e"), parts.alias("__p")
            on = None
            for c in part_cols:
                eq = F.col(f"__e.{c}").eqNullSafe(F.col(f"__p.{c}"))
                on = eq if on is None else (on & eq)
            # un-hinted: in exactly this path the tuple frame is over the
            # literal cap and unbounded by construction — a forced
            # broadcast would bypass the size safety the cap exists for;
            # AQE still broadcasts it when it is merely thousands of rows
            affected = e.join(p, on, "left_semi")
        # un-hinted anti-join: the update batch is user-sized and a forced
        # broadcast bypasses the size safety; AQE broadcasts small batches
        kept = affected.join(updates.select(*keys), keys, "left_anti")
        # persist: the row count and the write would otherwise EACH
        # evaluate the affected-partition read + anti-join; the cache is
        # bounded by the touched partitions
        merged = kept.unionByName(updates.select(*existing.columns)).persist()
        n_rows = merged.count()
        (
            merged.repartition(*[F.col(c) for c in part_cols])
            .write.format(fmt)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*part_cols)
            .save(path)
        )
    finally:
        if merged is not None:
            merged.unpersist()
        parts.unpersist()
    return {"partitions_touched": n_touched, "rows_written": n_rows}
