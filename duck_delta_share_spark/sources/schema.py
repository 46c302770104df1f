"""Delta schemaString → Spark StructType.

The reference hand-rolls a 13-entry type map and degrades decimals and
nested struct/array/map to VARCHAR (`/root/reference/src/
duck_delta_share_extension.cpp:433-474`, map in
`src/include/duck_delta_share_extension.hpp:37-51`). Delta's
``schemaString`` IS Spark's StructType JSON serialization, so the faithful
(and strictly more capable) mapping is one call: ``StructType.fromJson``.
"""

from __future__ import annotations

import json

from pyspark.sql.types import StructField, StructType


def schema_from_string(schema_string: str) -> StructType:
    """Lossless parse, including decimal(p,s) and nested types the
    reference degrades to VARCHAR (SURVEY.md §1.2)."""
    return StructType.fromJson(json.loads(schema_string))


def split_partition_fields(
    schema: StructType, partition_columns: tuple[str, ...] | list[str]
) -> tuple[list[StructField], list[StructField]]:
    """Split the declared schema into (data fields, partition fields) —
    partition columns are NOT stored in the parquet data files; their
    values come from ``FileAction.partition_values`` and are re-attached
    per file (fixing the reference quirk where declared partition columns
    are never populated, SURVEY.md §2D)."""
    pset = set(partition_columns)
    data = [f for f in schema.fields if f.name not in pset]
    part = [f for f in schema.fields if f.name in pset]
    return data, part
