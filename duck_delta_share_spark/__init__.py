"""duck_delta_share_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the ``cwiq-os/duck_delta_share`` DuckDB
extension (a Delta Sharing client), re-designed Spark-first.

Layout (see SURVEY.md for the blueprint):

- ``client/``     pure-Python Delta Sharing REST client (no Spark dependency)
- ``sources/``    Spark readers: local parquet catalog + Python DataSource for
                  presigned-URL Delta Sharing scans, pushdown + pruning
- ``functions/``  column-level helpers (text, vectors, multimodal)
- ``operators/``  composite operators (dedup, similarity, as-of join, top-k)
- ``plans/``      the query inventory (SURVEY.md §2) with DuckDB oracle SQL
- ``streaming/``  Structured Streaming pipelines over the events table
"""

from duck_delta_share_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
