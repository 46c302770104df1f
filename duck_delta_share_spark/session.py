"""SparkSession factory with a scale-aware default configuration.

Local tests run on ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB posture described in SURVEY.md §7:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy
  switch) so a plan tuned at sf0.1 survives a 1000x scale-up.
- Arrow transfer on for every Python boundary (pandas UDFs, toPandas).
- UTC session timezone so timestamp semantics match the DuckDB oracle and
  are cluster-timezone-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "duck_delta_share_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    On a real cluster, ``master``/executor sizing come from spark-submit;
    everything set here is safe to keep. ``shuffle_partitions`` defaults to
    the local core count — on a cluster you'd set it (or let AQE coalesce
    from a high initial value) proportional to total cores.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle = shuffle_partitions or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- correctness pins (oracle parity) ---
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores ts as TIMESTAMP(NANOS) which Spark cannot
        # read natively; read as long ns and convert in catalog.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- adaptive execution: the 100 TB safety net ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Python DataSource filter pushdown (deltashare source, §A10)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # --- Python boundary: always Arrow-batched, never row-at-a-time ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing ---
        # 32 MB splits: small single-node datasets still spread across all
        # cores (splits are additionally bounded by parquet row groups).
        # On a real cluster override SPARK_GRAFT_MAX_PARTITION_BYTES to the
        # classic 128 MB so task count tracks data, not cores.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "33554432"),
        )
        # quiet local runs
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
