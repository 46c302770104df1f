"""Focused regressions for the r7 fuzz findings that live below the
query layer: a fully-pruned DataSource scan must return ZERO rows (not
crash on the None partition Spark passes when partitions() is empty),
and applying an OPQ rotation to wrong-dimension vectors must fail with
a clear geometry error, not a cryptic gufunc message."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_fully_pruned_scan_returns_empty_not_none_crash(spark, tmp_path):
    from duck_delta_share_spark.sources.delta_log import write_delta
    from duck_delta_share_spark.sources.delta_share import (
        DeltaShareDataSource,
    )

    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(20)],
                              "id long, v double"),
        t,
    )
    spark.dataSource.register(DeltaShareDataSource)
    df = (
        spark.read.format("deltashare")
        .option("deltaPath", str(t))
        .load()
        # stats pruning drops EVERY file: partitions() returns [] and
        # Spark still schedules one task with partition=None
        .where(F.col("id") > 10_000)
    )
    assert df.count() == 0
    assert df.collect() == []


def test_opq_rotation_dim_mismatch_fails_loud(spark):
    import numpy as np

    from duck_delta_share_spark.operators.similarity import rotate_vectors

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    R = np.eye(8)  # trained on 8-dim; vectors are 4-dim
    with pytest.raises(Exception, match="different embedding dim"):
        rotate_vectors(df, "embedding", R).collect()
