"""Streaming SCD2 maintenance (streaming/scd2.py) vs the batch CDF fold:
same versioned dimension, including multi-change-per-batch chains,
no-op-churn collapse, and exactly-once across a restart."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duck_delta_share_spark.sources.delta_log import (
    merge_delta,
    read_delta,
    snapshot,
    write_delta,
)
from duck_delta_share_spark.streaming.scd2 import maintain_scd2_stream


def _batch_fold(spark, source):
    """The scd2_dimension_cdf query's fold over the FULL change feed."""
    changes = (
        spark.read.format("deltashare")
        .option("deltaPath", str(source))
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load()
        .where("_change_type = 'insert'")
        .select("k", "v", "_commit_version")
    )
    w = Window.partitionBy("k").orderBy("_commit_version")
    real = changes.withColumn("__p", F.lag("v").over(w)).where(
        F.col("__p").isNull() | (F.col("v") != F.col("__p"))
    )
    return real.select(
        "k",
        "v",
        F.col("_commit_version").alias("valid_from"),
        F.lead("_commit_version").over(w).alias("valid_to"),
        F.lead("_commit_version").over(w).isNull().cast("int").alias("is_current"),
    )


def _dim_rows(spark, dim):
    return {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in read_delta(spark, dim).collect()
    }


def test_scd2_stream_matches_batch_fold(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.dataSource.register(DeltaShareDataSource)
    source = tmp_path / "src"
    dim = tmp_path / "dim"
    ck = tmp_path / "ck"
    base = spark.range(20).selectExpr("id AS k", "id * 10 AS v")
    write_delta(base.repartition(3), source)

    q = maintain_scd2_stream(spark, source, dim, "k", "v", ck)
    try:
        q.processAllAvailable()
        # wave 1 alone in a batch
        merge_delta(
            spark,
            source,
            base.where("k % 3 = 0").selectExpr("k", "v + 100 AS v"),
            ["k"],
        )
        q.processAllAvailable()
        # waves 2+3 land in ONE batch: k%6=0 keys chain two versions
        merge_delta(
            spark,
            source,
            base.where("k % 6 = 0").selectExpr("k", "v + 200 AS v"),
            ["k"],
        )
        merge_delta(
            spark,
            source,
            base.where("k % 6 = 0").selectExpr("k", "v + 300 AS v"),
            ["k"],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    expected = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in _batch_fold(spark, source).collect()
    }
    assert _dim_rows(spark, dim) == expected
    # k%6=0 keys went v -> v+100 -> v+200 -> v+300: four rows of history
    k0 = sorted(
        (r.valid_from, r.v, r.is_current)
        for r in read_delta(spark, dim).where("k = 6").collect()
    )
    assert [x[1] for x in k0] == [60, 160, 260, 360]
    assert [x[2] for x in k0] == [0, 0, 0, 1]

    # restart with the same checkpoint: nothing re-applied
    before = _dim_rows(spark, dim)
    q2 = maintain_scd2_stream(spark, source, dim, "k", "v", ck)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert _dim_rows(spark, dim) == before


def test_scd2_stream_with_rate_limit(spark, tmp_path):
    """Composition: maxFilesPerTrigger admission control feeding the SCD2
    maintenance stream — three single-file source commits fold as three
    bounded micro-batches and the dimension still matches the batch
    fold exactly (exactly-once survives the throttled pacing)."""
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource
    from duck_delta_share_spark.sources.delta_log import (
        last_txn_version,
        write_delta as _wd,
    )
    from duck_delta_share_spark.streaming.scd2 import fold_scd2_batch, _txn_app

    spark.dataSource.register(DeltaShareDataSource)
    source = tmp_path / "src_rl"
    dim = tmp_path / "dim_rl"
    ck = tmp_path / "ck_rl"
    base = spark.range(10).selectExpr("id AS k", "id * 7 AS v")
    _wd(base.coalesce(1), source)

    app = _txn_app(dim)

    # hand-built stream with the rate limit option (maintain_scd2_stream
    # without a limit is covered by the main test)
    changes = (
        spark.readStream.format("deltashare")
        .option("deltaPath", str(source))
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "1")
        .load()
    )

    def apply(batch_df, batch_id):
        if batch_id <= last_txn_version(dim, app):
            return
        fold_scd2_batch(spark, batch_df, dim, "k", "v")
        _wd(
            batch_df.limit(0).selectExpr(
                "k", "v",
                "_commit_version AS valid_from",
                "_commit_version AS valid_to",
                "CAST(0 AS INT) AS is_current",
            ),
            dim,
            txn=(app, batch_id),
        )

    q = (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(ck))
        .start()
    )
    try:
        q.processAllAvailable()
        for wave in range(1, 4):
            merge_delta(
                spark,
                source,
                base.where("k % 3 = 0").selectExpr(
                    "k", f"v + {wave * 100} AS v"
                ),
                ["k"],
            )
        q.processAllAvailable()
        batches = [p.numInputRows for p in q.recentProgress if p.numInputRows > 0]
        assert len(batches) >= 4  # the three waves were throttled apart
    finally:
        q.stop()
    expected = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in _batch_fold(spark, source).collect()
    }
    assert _dim_rows(spark, dim) == expected
    # k%3=0 keys have the full 4-version chain despite the pacing
    assert len(read_delta(spark, dim).where("k = 3").collect()) == 4


def test_scd2_fold_replay_is_noop(spark, tmp_path):
    """Crash-window replay (merge landed, txn marker did not): re-folding
    the SAME multi-change batch must be a no-op. Without the __cur_from
    guard, a key that changed value twice in the batch re-admits its
    earlier version against the already-advanced current row and the
    closing row collides with the re-derived current row on the
    (key, valid_from) merge key — corrupting the dimension."""
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource
    from duck_delta_share_spark.streaming.scd2 import fold_scd2_batch

    spark.dataSource.register(DeltaShareDataSource)
    source = tmp_path / "src_replay"
    dim = tmp_path / "dim_replay"
    base = spark.range(6).selectExpr("id AS k", "id * 10 AS v")
    write_delta(base.coalesce(1), source)
    # two more versions: k%2=0 keys chain v -> v+100 -> v+200
    merge_delta(
        spark, source, base.where("k % 2 = 0").selectExpr("k", "v + 100 AS v"), ["k"]
    )
    merge_delta(
        spark, source, base.where("k % 2 = 0").selectExpr("k", "v + 200 AS v"), ["k"]
    )
    batch = (
        spark.read.format("deltashare")
        .option("deltaPath", str(source))
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    fold_scd2_batch(spark, batch, dim, "k", "v")
    once = _dim_rows(spark, dim)
    assert once == {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in _batch_fold(spark, source).collect()
    }
    # replay the identical batch (crash before the marker): no-op
    fold_scd2_batch(spark, batch, dim, "k", "v")
    assert _dim_rows(spark, dim) == once
    # and every (k, valid_from) key is still unique
    n = read_delta(spark, dim).count()
    assert read_delta(spark, dim).select("k", "valid_from").distinct().count() == n


def test_scd2_fold_null_transitions(spark, tmp_path):
    """NULL is a real dimension value (self-review r5): value -> NULL and
    NULL -> value transitions open versions, NULL -> NULL churn does not,
    and a NULL mid-chain must not fabricate a same-value version."""
    from duck_delta_share_spark.streaming.scd2 import fold_scd2_batch

    dim = tmp_path / "dim_null"
    # batch 1: k=1 starts at 'a'; k=2 starts at NULL
    b1 = spark.createDataFrame(
        [(1, "a", "insert", 0), (2, None, "insert", 0)],
        "k long, v string, _change_type string, _commit_version long",
    )
    fold_scd2_batch(spark, b1, dim, "k", "v")
    # batch 2, multi-change: k=1 goes a -> b -> NULL -> b (three versions);
    # k=2 sees NULL churn (no version) then 'x'
    b2 = spark.createDataFrame(
        [
            (1, "b", "insert", 1),
            (1, None, "insert", 2),
            (1, "b", "insert", 3),
            (2, None, "insert", 2),
            (2, "x", "insert", 3),
        ],
        "k long, v string, _change_type string, _commit_version long",
    )
    fold_scd2_batch(spark, b2, dim, "k", "v")
    rows = sorted(
        (
            (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
            for r in read_delta(spark, dim).collect()
        ),
        key=lambda x: (x[0], x[2]),
    )
    assert rows == [
        (1, "a", 0, 1, 0),
        (1, "b", 1, 2, 0),
        (1, None, 2, 3, 0),
        (1, "b", 3, None, 1),
        (2, None, 0, 3, 0),
        (2, "x", 3, None, 1),
    ], rows


def test_scd2_fold_effectless_batch_no_rewrite(spark, tmp_path):
    """A pure-churn batch must not touch the dimension at all (self-review
    r5): an empty merge frame would pass every file through stats_allow
    and rewrite the ENTIRE table as remove+add."""
    from duck_delta_share_spark.sources.delta_log import latest_version
    from duck_delta_share_spark.streaming.scd2 import fold_scd2_batch

    dim = tmp_path / "dim_churn"
    base = spark.range(10).selectExpr(
        "id AS k", "CAST(id AS STRING) AS v",
        "'insert' AS _change_type", "CAST(0 AS LONG) AS _commit_version",
    )
    fold_scd2_batch(spark, base, dim, "k", "v")
    v0 = latest_version(dim)
    files0 = {f["url"] for f in snapshot(dim).files}
    # churn: identical values re-inserted at a later version
    churn = spark.range(10).selectExpr(
        "id AS k", "CAST(id AS STRING) AS v",
        "'insert' AS _change_type", "CAST(1 AS LONG) AS _commit_version",
    )
    fold_scd2_batch(spark, churn, dim, "k", "v")
    assert latest_version(dim) == v0  # no commit at all
    assert {f["url"] for f in snapshot(dim).files} == files0
