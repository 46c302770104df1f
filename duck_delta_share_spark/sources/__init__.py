"""Spark-facing sources: Delta Sharing schema mapping, filter pushdown
translation, file pruning, catalog listing DataFrames, and the
``deltashare`` Python DataSource (Spark ≥ 4)."""
