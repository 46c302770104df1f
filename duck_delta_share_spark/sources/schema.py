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

    Top-level names only — NESTED struct fields carry their own mapping
    metadata, translated separately: reads via
    :func:`relabel_nested_to_logical` (zero-copy arrow view), writes via
    :func:`physical_data_type` (positional Spark cast).
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


def _phys_name(f: StructField) -> str:
    return (f.metadata or {}).get(PHYSICAL_NAME_KEY, f.name)


def physical_data_type(dt):
    """Recursively rename LOGICAL field names to PHYSICAL ones in a Spark
    DataType (structs at any depth, incl. inside arrays/maps) — the type
    a column-mapped parquet file physically stores. Spark's struct cast
    is positional, so ``col.cast(physical_data_type(dt))`` relabels a
    whole nested column in one codegen expression (write path)."""
    from pyspark.sql.types import ArrayType, MapType

    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(_phys_name(f), physical_data_type(f.dataType), f.nullable)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(physical_data_type(dt.elementType), dt.containsNull)
    if isinstance(dt, MapType):
        return MapType(
            physical_data_type(dt.keyType),
            physical_data_type(dt.valueType),
            dt.valueContainsNull,
        )
    return dt


def has_nested_mapping(schema: StructType) -> bool:
    """True when any NON-top-level field carries a physicalName rename."""
    from pyspark.sql.types import ArrayType, MapType

    def nested(dt) -> bool:
        if isinstance(dt, StructType):
            return any(_phys_name(f) != f.name or nested(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return nested(dt.elementType)
        if isinstance(dt, MapType):
            return nested(dt.keyType) or nested(dt.valueType)
        return False

    return any(nested(f.dataType) for f in schema.fields)


def _logical_arrow_type(at, dt):
    """The arrow type ``at`` with every struct field renamed physical →
    logical per the Spark schema ``dt`` — SAME physical layout, so a
    zero-copy ``Array.view`` performs the relabel. Field ORDER must match
    (Delta writers never reorder under column mapping; evolution appends
    on both sides) — a mismatch raises instead of mislabeling."""
    import pyarrow as pa
    from pyspark.sql.types import ArrayType, MapType

    if pa.types.is_struct(at) and isinstance(dt, StructType):
        have = [at.field(i).name for i in range(at.num_fields)]
        want = [_phys_name(f) for f in dt.fields]
        if have != want:
            raise ValueError(
                f"column-mapped struct field order mismatch: file has "
                f"{have}, schema expects physical {want}"
            )
        return pa.struct(
            [
                pa.field(
                    f.name,
                    _logical_arrow_type(at.field(i).type, f.dataType),
                    nullable=at.field(i).nullable,
                )
                for i, f in enumerate(dt.fields)
            ]
        )
    if pa.types.is_list(at) and isinstance(dt, ArrayType):
        vf = at.value_field
        return pa.list_(
            pa.field(vf.name, _logical_arrow_type(vf.type, dt.elementType),
                     nullable=vf.nullable)
        )
    if pa.types.is_large_list(at) and isinstance(dt, ArrayType):
        vf = at.value_field
        return pa.large_list(
            pa.field(vf.name, _logical_arrow_type(vf.type, dt.elementType),
                     nullable=vf.nullable)
        )
    if pa.types.is_map(at) and isinstance(dt, MapType):
        return pa.map_(
            _logical_arrow_type(at.key_type, dt.keyType),
            _logical_arrow_type(at.item_type, dt.valueType),
        )
    return at


def relabel_nested_to_logical(table, data_schema: StructType):
    """Zero-copy relabel of nested physical struct field names to logical
    ones across a (top-level already logical-named) arrow table."""
    import pyarrow as pa

    by_name = {f.name: f for f in data_schema.fields}
    out = table
    for i, name in enumerate(table.column_names):
        f = by_name.get(name)
        if f is None:
            continue
        col = table.column(i)
        target = _logical_arrow_type(col.type, f.dataType)
        if target == col.type:
            continue
        if isinstance(col, pa.ChunkedArray):
            col = pa.chunked_array(
                [c.view(target) for c in col.chunks], type=target
            )
        else:
            col = col.view(target)
        out = out.set_column(i, name, col)
    return out
