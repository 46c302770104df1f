"""User-defined-function surface (SURVEY.md §2B "UDF/UDAF/UDTF" row): one
oracle-checked query per extension mechanism —

- ``udf_python_scalar`` — row-at-a-time Python UDF. Deliberately the SLOW
  path (pickled per row); kept tiny and included because the engine must
  support it, with the pandas variant beside it as the recommended shape.
- ``udf_pandas_scalar`` — Arrow-vectorized ``pandas_udf``: the 10-100×
  faster batch path for Python logic that built-ins can't express.
- ``udaf_grouped_pandas`` — custom aggregation via ``applyInPandas``
  (grouped-map): per-group median, a true hole in built-in SQL aggregates
  (exact percentile needs the whole group).
- ``udtf_token_chunks`` — Python UDTF (Spark ≥ 4) exploding each document
  into overlapping fixed-size token windows — the LLM-context-chunking
  primitive, one row in → many rows out with its own output schema.

The reference has no UDF surface at all (pure scan client,
``/root/reference/src/duck_delta_share_extension.cpp:654-662``); these
exercise the host-engine capability the reference delegates to DuckDB.

Scale notes: the pandas UDF / applyInPandas paths move data over Arrow in
``spark.sql.execution.arrow.maxRecordsPerBatch`` chunks — executor memory
per task stays bounded; the UDTF streams one input row at a time. All
outputs here are deterministic (no RNG, no floats summed across rows except
via exact int sums), so the driver's value-hash gate holds at any
parallelism.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Row-at-a-time Python UDF (the slow path — supported, not recommended)
# ---------------------------------------------------------------------------

_VOWELS = set("aeiou")


def _vowel_count(s):
    # Untyped on purpose: a `str | None` hint trips UDF eval-type inference.
    return 0 if s is None else sum(1 for ch in s if ch in _VOWELS)


@query(
    "udf_python_scalar",
    oracle="""
SELECT doc_id,
       CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[aeiou]', '', 'g')) AS INT)
         AS n_vowels
FROM documents WHERE text IS NOT NULL
""",
    doc="row-at-a-time Python UDF (vowel count); slow path kept minimal — "
    "the pandas variant below is the recommended shape",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text excluded on both sides: the UDF's NULL handling vs the
    # oracle's NULL propagation flip the pandas dtype family (r7 fuzz)
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    vowels = F.udf(_vowel_count, IntegerType())
    return d.select("doc_id", vowels("text").alias("n_vowels"))


# ---------------------------------------------------------------------------
# Arrow-vectorized pandas UDF (the fast Python path)
# ---------------------------------------------------------------------------


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT doc_id,
       ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE), 6) AS avg_token_len
FROM documents
""",
    doc="Arrow-batched pandas UDF: mean token length via vectorized pandas "
    "str ops (single IEEE division per row → oracle-exact)",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def avg_token_len(text: pd.Series) -> pd.Series:
        compact = text.str.replace(" ", "", regex=False).str.len().astype("float64")
        n_tokens = text.str.split(" ").str.len().astype("float64")
        return (compact / n_tokens).round(6)

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", avg_token_len("text").alias("avg_token_len"))


# ---------------------------------------------------------------------------
# Custom aggregation: applyInPandas grouped-map (exact per-group median)
# ---------------------------------------------------------------------------

_MEDIAN_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_docs", LongType()),
        StructField("median_chars", DoubleType()),
        StructField("total_chars", LongType()),
    ]
)


@query(
    "udaf_grouped_pandas",
    oracle="""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(QUANTILE_CONT(n_chars, 0.5) AS DOUBLE) AS median_chars,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, source
""",
    doc="custom UDAF via applyInPandas: exact per-group median (linear "
    "interpolation = QUANTILE_CONT) + exact int sums; whole group required "
    "per task. SCALE NOTE: grouped-map materializes each WHOLE group as "
    "one pandas frame, and with a fixed (lang, source) set the group "
    "SIZE is corpus-proportional — this query deliberately exercises the "
    "UDAF surface; the production form of this aggregate is the builtin "
    "percentile() (see window_rolling_median), which never copies a "
    "group into Python",
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "median_chars": [float(pdf["n_chars"].median())],
                "total_chars": [int(pdf["n_chars"].sum())],
            }
        )

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").applyInPandas(stats, _MEDIAN_SCHEMA)


# ---------------------------------------------------------------------------
# Python UDTF: one document → overlapping token-window chunks
# ---------------------------------------------------------------------------

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # tokens between chunk starts (8-token overlap)

_CHUNK_SCHEMA = StructType(
    [
        StructField("chunk_idx", IntegerType()),
        StructField("chunk_text", StringType()),
        StructField("n_tokens", IntegerType()),
    ]
)


class _TokenChunks:
    """UDTF: yield overlapping ``_CHUNK``-token windows every ``_STRIDE``
    tokens — the standard LLM-context chunking shape. The final partial
    window is kept (n_tokens < _CHUNK) so no text is dropped."""

    def eval(self, text: str | None) -> Iterator[tuple[int, str, int]]:
        if text is None:
            return
        toks = text.split(" ")
        idx = 0
        for start in range(0, len(toks), _STRIDE):
            window = toks[start : start + _CHUNK]
            yield idx, " ".join(window), len(window)
            idx += 1
            if start + _CHUNK >= len(toks):
                break


@query(
    "udtf_token_chunks",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(u.pos - 1 AS INT) AS chunk_idx,
       ARRAY_TO_STRING(t[(u.pos - 1) * {_STRIDE} + 1 : (u.pos - 1) * {_STRIDE} + {_CHUNK}], ' ')
         AS chunk_text,
       CAST(LEAST({_CHUNK}, LEN(t) - (u.pos - 1) * {_STRIDE}) AS INT) AS n_tokens
FROM toks,
     UNNEST(GENERATE_SERIES(1, GREATEST((LEN(t) - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE}, 0) + 1))
       AS u(pos)
""",
    doc=f"Python UDTF: document → overlapping {_CHUNK}-token windows with "
    f"{_CHUNK - _STRIDE}-token overlap (LLM context chunking); lateral join "
    "in SQL, one input row streamed at a time",
)
def udtf_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    chunker = udtf(_TokenChunks, returnType=_CHUNK_SCHEMA)
    spark.udtf.register("token_chunks", chunker)
    # NULL text excluded on both sides (r7 NULL fuzz: the UDTF's
    # NULL-row emission differed from the lateral oracle's)
    load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).createOrReplaceTempView("__docs_for_chunks")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens "
        "FROM __docs_for_chunks d, LATERAL token_chunks(d.text) c"
    )
