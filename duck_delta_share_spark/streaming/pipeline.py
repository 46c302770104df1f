"""Streaming twin of the batch training-prep pipeline: the same column
functions (fingerprint dedup, quality score, PII redaction —
`functions/text.py`, `plans/llm_ops.py:pipeline_training_prep`) composed
over a document STREAM, so ingest-time and backfill-time prep share one
code path (no lambda-architecture drift).

Scale shape: everything except the dedup is a narrow map over the
micro-batch (codegen regexp/string expressions — no Python workers);
dedup state is bounded by (arrival rate x watermark horizon) via
``dropDuplicatesWithinWatermark``, sharded by fingerprint across
executors. The ``ts`` event time is synthesized deterministically from
``doc_id`` for the fixture (real feeds carry ingest time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from duck_delta_share_spark.functions.text import (
    fingerprint,
    pii_redact,
    quality_score,
)

DOCUMENTS_RAW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a bounded stream (availableNow testing twin of
    a real document feed), with deterministic synthetic event time."""
    raw = (
        spark.readStream.schema(DOCUMENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir.rstrip("/"))
    )
    # offset a day past the epoch: a row whose event time equals the
    # INITIAL watermark (epoch 0) would be classified late and dropped
    return raw.withColumn(
        "ts", F.timestamp_micros((F.col("doc_id") + 86_400) * 1_000_000)
    )


def training_prep_stream(
    docs: DataFrame,
    min_quality: float = 0.6,
    watermark: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """content-dedup → quality gate → PII redaction over a stream.

    Column order of operations matches the batch composite: dedup keys on
    the RAW text fingerprint (so a redacted twin of a seen doc still
    dedupes), quality scores the raw text, redaction produces the
    training-safe payload.
    """
    deduped = (
        docs.withColumn("__fp", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
    return (
        deduped.withColumn("quality", quality_score(text_col))
        .filter(F.col("quality") >= min_quality)
        .select(
            "doc_id",
            "lang",
            F.round("quality", 6).alias("quality"),
            pii_redact(F.col(text_col)).alias("clean_text"),
        )
    )
