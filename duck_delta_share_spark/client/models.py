"""Data model for the Delta Sharing protocol.

Mirrors the reference's structs (`/root/reference/src/include/
delta_sharing_client.hpp:22-70`) as plain dataclasses; field shapes follow
the public Delta Sharing protocol JSON (FIXTURES.md §B).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Share:
    """A top-level share grant (hpp:22-25)."""

    name: str
    id: str = ""

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "Share":
        return cls(name=obj.get("name", ""), id=obj.get("id") or "")


@dataclass(frozen=True)
class Schema:
    """A schema (namespace) within a share (hpp:27-31)."""

    name: str
    share: str
    id: str = ""

    @classmethod
    def from_json(cls, obj: dict[str, Any], share: str = "") -> "Schema":
        return cls(name=obj.get("name", ""), share=obj.get("share", share), id=obj.get("id") or "")


@dataclass(frozen=True)
class Table:
    """A shared table (hpp:33-39)."""

    name: str
    schema: str
    share: str
    id: str = ""
    share_id: str = ""

    @classmethod
    def from_json(cls, obj: dict[str, Any], share: str = "", schema: str = "") -> "Table":
        return cls(
            name=obj.get("name", ""),
            schema=obj.get("schema", schema),
            share=obj.get("share", share),
            id=obj.get("id") or "",
            share_id=obj.get("shareId") or "",
        )


@dataclass(frozen=True)
class Protocol:
    """Reader version gate (hpp:41-43)."""

    min_reader_version: int = 1

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "Protocol":
        return cls(min_reader_version=int(obj.get("minReaderVersion", 1)))


@dataclass(frozen=True)
class Format:
    """Data format; the client always requests parquet (hpp:45-48)."""

    provider: str = "parquet"
    options: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class TableMetadata:
    """Table metadata from the /metadata or /query response (hpp:50-59).

    ``schema_string`` is Spark StructType JSON — parsed losslessly by the
    reader (SURVEY.md §1.2), including decimal/nested types the reference
    degrades to VARCHAR.
    """

    id: str = ""
    name: str = ""
    description: str = ""
    format: Format = field(default_factory=Format)
    schema_string: str = ""
    partition_columns: tuple[str, ...] = ()
    configuration: dict[str, str] = field(default_factory=dict)
    version: int = -1

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "TableMetadata":
        fmt = obj.get("format") or {}
        return cls(
            id=obj.get("id") or "",
            name=obj.get("name") or "",
            description=obj.get("description") or "",
            format=Format(
                provider=fmt.get("provider", "parquet"), options=fmt.get("options") or {}
            ),
            schema_string=obj.get("schemaString") or "",
            partition_columns=tuple(obj.get("partitionColumns") or ()),
            configuration=obj.get("configuration") or {},
            version=int(obj.get("version", -1)),
        )


@dataclass(frozen=True)
class FileAction:
    """One data file of a shared table (hpp:61-70): a presigned URL plus
    partition values and optional JSON stats. One FileAction = one Spark
    input partition in the reader."""

    url: str
    id: str = ""
    partition_values: dict[str, str | None] = field(default_factory=dict)
    size: int = 0
    stats: str = ""
    version: int = -1
    timestamp: int = -1
    expiration_timestamp: int = -1

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "FileAction":
        return cls(
            url=obj.get("url", ""),
            id=obj.get("id") or "",
            partition_values=obj.get("partitionValues") or {},
            size=int(obj.get("size", 0)),
            stats=obj.get("stats") or "",
            version=int(obj.get("version", -1)),
            timestamp=int(obj.get("timestamp", -1)),
            expiration_timestamp=int(obj.get("expirationTimestamp", -1)),
        )

    def parsed_stats(self) -> dict[str, Any]:
        """Decode the per-file stats JSON (numRecords/minValues/maxValues/
        nullCount). The reference parses but never uses these
        (`delta_sharing_client.cpp:450-451`); we use them for file pruning."""
        if not self.stats:
            return {}
        try:
            return json.loads(self.stats)
        except (ValueError, TypeError):
            return {}


@dataclass(frozen=True)
class TableFiles:
    """Result of a /query POST: protocol + metadata + file list."""

    protocol: Protocol
    metadata: TableMetadata
    files: tuple[FileAction, ...]


@dataclass(frozen=True)
class ChangeAction:
    """One action from GET .../changes (change data feed). ``action_type``
    says how the file's rows entered the table: ``add`` → inserts,
    ``remove`` → deletes, ``cdf`` → the file itself carries a
    ``_change_type`` column (update pre/post images). Public Delta Sharing
    protocol surface; the reference client has no CDF counterpart."""

    action_type: str
    file: FileAction


@dataclass(frozen=True)
class TableChanges:
    """Result of a /changes GET: protocol + metadata + ordered actions."""

    protocol: Protocol
    metadata: TableMetadata
    actions: tuple[ChangeAction, ...]
