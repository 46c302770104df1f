"""DeltaTable — the ergonomic handle delta-spark users expect
(``DeltaTable.forPath(...).toDF()/merge/delete/...``), as a thin façade
over the functional write/maintenance surface in ``sources/delta_log``.

Nothing here adds behavior: every method delegates to the already-tested
function (one line each), so users of the reference who know delta-spark's
object API can drive this engine without learning the functional one. The
reference itself exposes only table functions
(`/root/reference/src/duck_delta_share_extension.cpp`), no writer handle
at all.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from duck_delta_share_spark.sources import delta_log as _dl


class DeltaTable:
    """Handle on a local Delta table path (existing or about to exist)."""

    def __init__(self, spark: SparkSession, path: str | Path):
        self.spark = spark
        self.path = Path(path)

    # -- constructors --------------------------------------------------------

    @classmethod
    def forPath(cls, spark: SparkSession, path: str | Path) -> "DeltaTable":
        t = cls(spark, path)
        _dl.snapshot(t.path)  # fail fast on non-tables, like delta-spark
        return t

    @classmethod
    def createFrom(
        cls,
        spark: SparkSession,
        df: DataFrame,
        path: str | Path,
        **write_kwargs,
    ) -> "DeltaTable":
        _dl.write_delta(df, path, **write_kwargs)
        return cls(spark, path)

    @classmethod
    def convertFromParquet(
        cls, spark: SparkSession, path: str | Path, **convert_kwargs
    ) -> "DeltaTable":
        _dl.convert_to_delta(spark, path, **convert_kwargs)
        return cls(spark, path)

    # -- read ----------------------------------------------------------------

    def toDF(
        self, version: int | None = None, with_row_ids: bool = False
    ) -> DataFrame:
        return _dl.read_delta(
            self.spark, self.path, version=version, with_row_ids=with_row_ids
        )

    def snapshot(self, version: int | None = None):
        return _dl.snapshot(self.path, version)

    def version(self) -> int:
        return _dl.latest_version(self.path)

    def history(self, limit: int | None = None) -> list[dict]:
        return _dl.describe_history(self.path, limit=limit)

    # -- write / maintenance -------------------------------------------------

    def write(self, df: DataFrame, **write_kwargs) -> int:
        return _dl.write_delta(df, self.path, **write_kwargs)

    def merge(self, updates: DataFrame, key_cols: list[str]) -> dict:
        return _dl.merge_delta(self.spark, self.path, updates, key_cols)

    def delete(self, condition: str) -> dict:
        return _dl.delete_where(self.spark, self.path, condition)

    def update(self, condition: str, assignments: dict[str, str]) -> dict:
        return _dl.update_where(self.spark, self.path, condition, assignments)

    def optimize(self, **kwargs) -> dict:
        return _dl.optimize(self.spark, self.path, **kwargs)

    def restore(self, version: int) -> dict:
        return _dl.restore_delta(self.path, version)

    def vacuum(self, retain_hours: float = 168.0) -> dict:
        return _dl.vacuum(self.path, retain_hours=retain_hours)

    def checkpoint(self, max_actions_per_part: int | None = None) -> int:
        return _dl.checkpoint(self.path, max_actions_per_part)

    def clone(self, target: str | Path, version: int | None = None) -> "DeltaTable":
        _dl.clone_delta(self.path, target, version=version)
        return DeltaTable(self.spark, target)

    def addCheckConstraint(self, name: str, expr: str, validate: bool = True) -> int:
        return _dl.add_check_constraint(
            self.spark, self.path, name, expr, validate=validate
        )

    def dropCheckConstraint(self, name: str) -> int:
        return _dl.drop_check_constraint(self.path, name)
