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


PHYSICAL_NAME_KEY = "delta.columnMapping.physicalName"


def column_mapping(schema: StructType) -> dict[str, str] | None:
    """Logical column name → physical parquet name for column-mapping
    tables (Delta protocol "Column Mapping": minReaderVersion 2, or 3 with
    readerFeatures=[columnMapping]). The mapping lives as
    ``delta.columnMapping.physicalName`` metadata on each schemaString
    field — present in both ``name`` and ``id`` mode (id mode additionally
    stores field ids; matching by physicalName serves both, since Delta
    writers always emit it). Returns None for unmapped tables.

    Top-level columns only: nested struct fields carry their own mapping
    metadata, which this reader does not yet translate — flat relational
    schemas (the entire fixture surface) are fully covered.
    """
    m: dict[str, str] = {}
    for f in schema.fields:
        phys = (f.metadata or {}).get(PHYSICAL_NAME_KEY)
        if phys and phys != f.name:
            m[f.name] = phys
    return m or None


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
