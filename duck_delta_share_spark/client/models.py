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
    """Reader version gate (hpp:41-43). ``reader_features`` comes from the
    delta response format's protocol line (public Delta Sharing protocol,
    ``delta-sharing-capabilities: responseformat=delta``); empty for
    classic parquet-format responses."""

    min_reader_version: int = 1
    reader_features: tuple[str, ...] = ()

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "Protocol":
        # delta response format wraps the real protocol action:
        # {"protocol": {"deltaProtocol": {"minReaderVersion": 3, ...}}}
        inner = obj.get("deltaProtocol", obj)
        return cls(
            min_reader_version=int(inner.get("minReaderVersion", 1)),
            reader_features=tuple(inner.get("readerFeatures") or ()),
        )


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
        # delta response format nests the Delta metaData action:
        # {"metaData": {"version": N, "deltaMetadata": {...}}}
        inner = obj.get("deltaMetadata") or obj
        fmt = inner.get("format") or {}
        return cls(
            id=inner.get("id") or "",
            name=inner.get("name") or "",
            description=inner.get("description") or "",
            format=Format(
                provider=fmt.get("provider", "parquet"), options=fmt.get("options") or {}
            ),
            schema_string=inner.get("schemaString") or "",
            partition_columns=tuple(inner.get("partitionColumns") or ()),
            configuration=inner.get("configuration") or {},
            version=int(obj.get("version", inner.get("version", -1))),
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
    # delta response format only: the add action's deletion-vector
    # descriptor (storageType/pathOrInlineDv/offset/sizeInBytes/
    # cardinality) — the server presigns file-based DV paths, so
    # pathOrInlineDv is an http(s) URL or an inline z85 payload. The
    # reference ignores DVs entirely and would return deleted rows
    # (delta_sharing_client.cpp:357-369).
    deletion_vector: dict[str, Any] | None = None

    @classmethod
    def from_delta_action(cls, obj: dict[str, Any]) -> tuple[str, "FileAction"]:
        """Parse a delta-response-format file line: {"file": {"id": ...,
        "version": ..., "expirationTimestamp": ..., "deltaSingleAction":
        {"add"|"remove"|"cdc": {"path": <presigned url>, "partitionValues":
        ..., "stats": ..., "deletionVector": {...}}}}}. Returns
        (action_kind, file_action) with Delta's "cdc" normalized to the
        sharing protocol's "cdf"."""
        dsa = obj["deltaSingleAction"]
        kind = next(iter(dsa))
        inner = dsa[kind] or {}
        fa = cls(
            url=inner.get("path", ""),
            id=obj.get("id") or "",
            partition_values=inner.get("partitionValues") or {},
            # `x or default` guards: optional numeric fields may arrive as
            # EXPLICIT JSON nulls (remove.size is optional in the Delta
            # spec) — .get defaults don't apply to present-but-null keys
            size=int(inner.get("size") or 0),
            stats=inner.get("stats") or "",
            version=int(obj.get("version") if obj.get("version") is not None else -1),
            timestamp=int(obj.get("timestamp") if obj.get("timestamp") is not None else -1),
            expiration_timestamp=int(
                obj.get("expirationTimestamp")
                if obj.get("expirationTimestamp") is not None
                else -1
            ),
            deletion_vector=inner.get("deletionVector"),
        )
        return ("cdf" if kind == "cdc" else kind), fa

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "FileAction":
        if "deltaSingleAction" in obj:
            return cls.from_delta_action(obj)[1]
        return cls(
            url=obj.get("url", ""),
            id=obj.get("id") or "",
            partition_values=obj.get("partitionValues") or {},
            size=int(obj.get("size") or 0),
            stats=obj.get("stats") or "",
            version=int(obj.get("version") if obj.get("version") is not None else -1),
            timestamp=int(obj.get("timestamp") if obj.get("timestamp") is not None else -1),
            expiration_timestamp=int(
                obj.get("expirationTimestamp")
                if obj.get("expirationTimestamp") is not None
                else -1
            ),
            deletion_vector=obj.get("deletionVector"),
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
    """Result of a /query POST: protocol + metadata + file list.

    ``refresh_token`` (public protocol ``includeRefreshToken`` /
    ``endStreamAction.refreshToken``) lets presigned URLs be re-fetched
    with a cheap token-only /query instead of re-planning the whole query
    with predicate hints."""

    protocol: Protocol
    metadata: TableMetadata
    files: tuple[FileAction, ...]
    refresh_token: str | None = None


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
