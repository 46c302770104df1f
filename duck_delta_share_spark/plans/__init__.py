"""Query inventory (SURVEY.md §2): every operator the engine supports is
registered here as a (Spark callable, DuckDB oracle SQL) pair consumed by
``__spark_entry__.py``. Import side effects populate the registry."""

from duck_delta_share_spark.plans.registry import QUERIES, QueryDef, query

# Register all query modules (import side effects fill QUERIES).
# Registration ORDER is part of the driver contract: per-round correctness
# checks cover the first 50 registry entries, so the differentiating
# surfaces (LLM pipeline ops, UDF/UDTF, the Delta Sharing DataSource scan,
# streaming twins' batch anchors) register FIRST; the TPC-H sweep — fully
# hash-verified in round 1 — registers last. All queries stay registered.
from duck_delta_share_spark.plans import llm_ops  # noqa: E402,F401
from duck_delta_share_spark.plans import timeseries_queries  # noqa: E402,F401
from duck_delta_share_spark.plans import udf_surface  # noqa: E402,F401
from duck_delta_share_spark.plans import datasource_queries  # noqa: E402,F401
from duck_delta_share_spark.plans import functions_sweep  # noqa: E402,F401
from duck_delta_share_spark.plans import relational  # noqa: E402,F401
from duck_delta_share_spark.plans import tpch  # noqa: E402,F401
from duck_delta_share_spark.plans import tpch_extended  # noqa: E402,F401
from duck_delta_share_spark.plans import tpch_complete  # noqa: E402,F401

__all__ = ["QUERIES", "QueryDef", "query"]
