"""Pure-Python Delta Sharing REST client (no Spark dependency).

Covers the reference's client surface (SURVEY.md §2A A1-A8, A16-A18):
profile/config, HTTP transport with bearer auth, NDJSON parsing,
list/get/metadata/query endpoints with pagination, error mapping.
"""

from duck_delta_share_spark.client.models import (
    ChangeAction,
    FileAction,
    Format,
    Protocol,
    Schema,
    Share,
    Table,
    TableChanges,
    TableFiles,
    TableMetadata,
)
from duck_delta_share_spark.client.profile import DeltaSharingProfile
from duck_delta_share_spark.client.rest import DeltaSharingClient, DeltaSharingError

__all__ = [
    "ChangeAction",
    "DeltaSharingClient",
    "DeltaSharingError",
    "DeltaSharingProfile",
    "FileAction",
    "Format",
    "Protocol",
    "Schema",
    "Share",
    "Table",
    "TableChanges",
    "TableFiles",
    "TableMetadata",
]
