"""``deltashare`` — a Spark 4 Python DataSource that scans Delta-Shared
tables natively: the Spark-first re-design of the reference's
``delta_share_read`` table function (`/root/reference/src/
duck_delta_share_extension.cpp:495-629`).

Plan shape (SURVEY.md §3.2 "Spark trace"):

- driver: metadata GET → ``StructType.fromJson(schemaString)`` (lossless,
  §A9), query POST with jsonPredicateHints (§A10) → FileActions; partition
  + stats pruning happens HERE, before task scheduling, so pruned files
  never become tasks.
- one ``InputPartition`` per surviving FileAction → with N executors the
  scan parallelizes per file, vs. the reference's sequential single-cursor
  loop (extension.cpp:569-575). At 100 TB / thousands of files this is the
  entire difference between hours and minutes.
- executors: RANGE-read their presigned URL (footer + projected column
  chunks of row groups surviving min/max pruning — see ``range_io``; data
  plane goes straight to object storage, never through the sharing
  server), attach partition values as typed constant columns (fixing the
  reference quirk of declaring-but-never-populating partition columns,
  §2D), and yield Arrow record batches.
- every pushed filter is ALSO kept in Spark's plan (``pushFilters`` returns
  all filters), so server/scan-side filtering is purely an optimization —
  fixing the reference's filter swallowing (extension.cpp:492).

Usage (REST mode):

    spark.dataSource.register(DeltaShareDataSource)
    df = (spark.read.format("deltashare")
          .option("endpoint", "https://...")
          .option("bearerToken", "...")
          .load("share.schema.table"))

Direct mode (no server; local/offline scans, tests, and the driver's
correctness gate) passes the file list + schemaString explicitly:

    .option("files", json.dumps([{"url": "/path/f.parquet",
                                  "partitionValues": {"pcol": "eu"}}]))
    .option("schemaString", struct_type.json())
    .option("partitionColumns", "pcol")
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

from duck_delta_share_spark.sources.pushdown import (
    filters_to_json_hints,
    filters_to_sql_hints,
    partition_matches,
    stats_allow,
)
from duck_delta_share_spark.sources.schema import schema_from_string, split_partition_fields


@dataclass
class _FileTask(InputPartition):
    """One file scan task: everything an executor needs, picklable.

    ``file_id`` + ``refresh`` (connection options) let the executor survive
    presigned-URL expiry (`FileAction.expiration_timestamp`, reference
    `src/include/delta_sharing_client.hpp:69`): on a failed fetch it
    re-queries the sharing server for a fresh URL for the same file id —
    the control plane is cheap, the data plane retries against object
    storage. REST mode only; direct-file mode has no server to ask.
    """

    url: str
    partition_values: dict[str, str | None]
    data_schema_json: str
    partition_schema_json: str
    full_schema_json: str
    file_id: str | None = None
    refresh: dict | None = None
    # pushed Filters travel to the executor for parquet ROW-GROUP min/max
    # pruning (file-level pruning already happened on the driver); plain
    # pyspark dataclasses, picklable.
    pushed: list | None = None
    # change-data-feed provenance: (action_type, commit_version,
    # commit_timestamp_ms). Set only for CDF reads; the executor turns it
    # into the _change_type/_commit_version/_commit_timestamp columns.
    change: tuple | None = None
    # deletion-vector descriptor (local Delta only; driver-resolved to
    # "p"/"i" storage): physical rows at these indexes are masked out
    # executor-side before any column is emitted.
    dv: dict | None = None
    # column mapping (logical -> physical parquet name) for tables with
    # delta.columnMapping; None for identity-named tables.
    col_map: dict | None = None
    # True when NESTED struct fields also carry physicalName renames —
    # the executor relabels them with a zero-copy arrow view.
    nested_map: bool = False
    # Row tracking: (baseRowId, defaultRowCommitVersion) when the read
    # materializes _row_id/_row_commit_version; None otherwise.
    row_ids: tuple | None = None
    # physical names of the table's materialized-row-id columns (protocol
    # preserved row ids): values found there win over baseRowId+row_index
    row_id_phys: tuple | None = None


def _parse_table_path(path: str | None, options: dict[str, str]) -> tuple[str, str, str]:
    raw = path or options.get("table", "")
    parts = raw.split(".")
    if len(parts) != 3:
        raise ValueError(
            f"deltashare path must be 'share.schema.table', got {raw!r}"
        )
    return parts[0], parts[1], parts[2]


# Columns synthesized by change-data-feed reads, mirroring Delta's CDF
# column contract so downstream MERGE/apply logic ports unchanged.
CDF_COLUMNS = ("_change_type", "_commit_version", "_commit_timestamp")

# Columns synthesized by row-tracking reads (protocol "Row Tracking"):
# _row_id = add.baseRowId + physical row index (stable under
# deletion-vector deletes), _row_commit_version = the add's
# defaultRowCommitVersion.
ROW_ID_COLUMNS = ("_row_id", "_row_commit_version")


def _row_ids_enabled(options: dict[str, str]) -> bool:
    raw = options.get("withrowids", options.get("withRowIds", ""))
    return str(raw).lower() in ("true", "1")


def _with_row_id_fields(schema: StructType) -> StructType:
    from pyspark.sql.types import LongType, StructField

    fields = [f for f in schema.fields if f.name not in ROW_ID_COLUMNS]
    return StructType(
        fields
        + [
            StructField("_row_id", LongType()),
            StructField("_row_commit_version", LongType()),
        ]
    )


def _cdf_enabled(options: dict[str, str]) -> bool:
    raw = options.get("readchangefeed", options.get("readChangeFeed", ""))
    return str(raw).lower() in ("true", "1")


def _delta_version(options: dict[str, str], delta: str) -> int | None:
    """Resolve versionAsOf / timestampAsOf (epoch ms or ISO datetime) for
    a local Delta table; None = latest."""
    version = options.get("versionasof", options.get("versionAsOf"))
    if version is not None:
        return int(version)
    ts = options.get("timestampasof", options.get("timestampAsOf"))
    if ts is None:
        return None
    from duck_delta_share_spark.sources.delta_log import version_at_timestamp

    try:
        ts_ms = int(ts)
    except ValueError:
        import datetime as dt

        parsed = dt.datetime.fromisoformat(str(ts).replace("Z", "+00:00"))
        if parsed.tzinfo is None:
            parsed = parsed.replace(tzinfo=dt.timezone.utc)
        ts_ms = int(parsed.timestamp() * 1000)
    return version_at_timestamp(delta, ts_ms)


def _delta_path(options: dict[str, str]) -> str | None:
    """Local-Delta mode: an explicit deltaPath option, or a load() path
    that is a filesystem directory containing _delta_log."""
    p = options.get("deltapath", options.get("deltaPath"))
    if p:
        return p
    path = options.get("path", "")
    if path and "://" not in path:
        import os.path

        if os.path.isdir(os.path.join(path, "_delta_log")):
            return path
    return None


def _with_cdf_fields(schema: StructType) -> StructType:
    from pyspark.sql.types import LongType, StringType, StructField, TimestampType

    fields = [f for f in schema.fields if f.name not in CDF_COLUMNS]
    return StructType(
        fields
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
            StructField("_commit_timestamp", TimestampType()),
        ]
    )


def _strip_cdf_fields(schema: StructType) -> StructType:
    return StructType([f for f in schema.fields if f.name not in CDF_COLUMNS])


class DeltaShareDataSource(DataSource):
    """Entry point; resolves the table schema at planning time (driver)."""

    @classmethod
    def name(cls) -> str:
        return "deltashare"

    def schema(self) -> StructType:
        delta = _delta_path(self.options)
        if "schemaString" in self.options:
            base = schema_from_string(self.options["schemaString"])
        elif delta:
            from duck_delta_share_spark.sources.delta_log import snapshot

            base = schema_from_string(
                snapshot(delta, _delta_version(self.options, delta)).schema_string
            )
        else:
            share, schema, table = _parse_table_path(self.options.get("path"), self.options)
            client = _make_client(self.options)
            version = self.options.get("versionasof", self.options.get("versionAsOf"))
            ts = self.options.get("timestampasof", self.options.get("timestampAsOf"))
            if version is not None and ts is not None:
                # fail at PLANNING time, consistent with _file_actions —
                # silently preferring version would resolve the schema
                # from an option the read later rejects
                raise ValueError(
                    "versionAsOf and timestampAsOf are mutually exclusive"
                )
            # time travel must read the POINT-IN-TIME schema: a column
            # added after the requested version would otherwise appear as
            # a spurious all-null column (or mis-cast a re-added column)
            _, metadata = client.query_table_metadata(
                share,
                schema,
                table,
                version=int(version) if version is not None else None,
                timestamp=ts,
            )
            base = schema_from_string(metadata.schema_string)
        if _cdf_enabled(self.options):
            return _with_cdf_fields(base)
        if _row_ids_enabled(self.options):
            return _with_row_id_fields(base)
        return base

    def reader(self, schema: StructType) -> "DeltaShareReader":
        return DeltaShareReader(dict(self.options), schema)

    def streamReader(self, schema: StructType) -> "DeltaShareStreamReader":
        return DeltaShareStreamReader(dict(self.options), schema)


def _make_client(options: dict[str, str]):
    from duck_delta_share_spark.client import DeltaSharingClient, DeltaSharingProfile

    if "profile" in options:
        profile = DeltaSharingProfile.from_file(options["profile"])
    else:
        profile = DeltaSharingProfile(
            endpoint=options.get("endpoint", ""),
            bearer_token=options.get("bearertoken", options.get("bearerToken", "")),
        )
    return DeltaSharingClient(profile)


class DeltaShareReader(DataSourceReader):
    def __init__(self, options: dict[str, str], schema: StructType):
        self.options = options
        self.schema = schema
        self.pushed: list[Filter] = []
        self._refresh_token: str | None = None
        self.partition_columns = tuple(
            c.strip()
            for c in options.get(
                "partitioncolumns", options.get("partitionColumns", "")
            ).split(",")
            if c.strip()
        )

    # -- pushdown (§A10): store filters, forward ALL of them to Spark -------

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        self.pushed = list(filters)
        # Hints are advisory; Spark re-applies everything (no swallowing).
        yield from filters

    # -- planning: REST query or direct file list, then pruning --------------

    def _file_actions(self) -> tuple[list[dict[str, Any]], tuple[str, ...]]:
        if "files" in self.options:
            files = json.loads(self.options["files"])
            return files, self.partition_columns
        delta = _delta_path(self.options)
        if delta:
            from duck_delta_share_spark.sources.delta_log import (
                snapshot,
                version_changes,
            )

            if _cdf_enabled(self.options):
                sv = self.options.get("startingversion", self.options.get("startingVersion"))
                if sv is None:
                    raise ValueError("readChangeFeed requires a startingVersion option")
                ev = self.options.get("endingversion", self.options.get("endingVersion"))
                from duck_delta_share_spark.sources.delta_log import latest_version

                end = int(ev) if ev is not None else latest_version(delta)
                snap = snapshot(delta)  # partition columns + protocol gate
                return version_changes(delta, int(sv), end), snap.partition_columns
            snap = snapshot(delta, _delta_version(self.options, delta))
            self._delta_conf = dict(snap.configuration)
            return list(snap.files), snap.partition_columns
        share, schema, table = _parse_table_path(self.options.get("path"), self.options)
        client = _make_client(self.options)
        if _cdf_enabled(self.options):
            sv = self.options.get("startingversion", self.options.get("startingVersion"))
            if sv is None:
                raise ValueError(
                    "readChangeFeed requires a startingVersion option"
                )
            ev = self.options.get("endingversion", self.options.get("endingVersion"))
            changes = client.query_table_changes(
                share,
                schema,
                table,
                starting_version=int(sv),
                ending_version=int(ev) if ev is not None else None,
            )
            files = [
                {
                    "url": a.file.url,
                    "id": a.file.id,
                    "partitionValues": dict(a.file.partition_values),
                    "stats": a.file.stats,
                    "action": a.action_type,
                    "version": a.file.version,
                    "timestamp": a.file.timestamp,
                    "deletionVector": a.file.deletion_vector,
                }
                for a in changes.actions
            ]
            return files, tuple(changes.metadata.partition_columns) or self.partition_columns
        version = self.options.get("versionasof", self.options.get("versionAsOf"))
        ts = self.options.get("timestampasof", self.options.get("timestampAsOf"))
        if version is not None and ts is not None:
            raise ValueError("versionAsOf and timestampAsOf are mutually exclusive")
        limit = self.options.get("limithint", self.options.get("limitHint"))
        result = client.query_table(
            share,
            schema,
            table,
            json_predicate_hints=filters_to_json_hints(self.pushed),
            # legacy SQL strings too: older servers ignore jsonPredicateHints
            # and would otherwise do zero server-side filtering
            predicate_hints=filters_to_sql_hints(self.pushed) or None,
            limit_hint=int(limit) if limit is not None else None,
            version=int(version) if version is not None else None,
            # protocol time travel: the /query body's timestamp field —
            # previously this option was silently IGNORED over REST and
            # the scan returned the latest version labeled point-in-time
            timestamp=ts,
            # ask for a refresh token so URL-expiry recovery can be a cheap
            # token-only re-query instead of a full re-plan (VERDICT r3 #9)
            include_refresh_token=True,
        )
        self._refresh_token = result.refresh_token
        files = [
            {
                "url": f.url,
                "id": f.id,
                "partitionValues": dict(f.partition_values),
                "stats": f.stats,
                # delta response format: presigned-URL DV descriptor, applied
                # executor-side as a row mask (same path as local Delta DVs)
                "deletionVector": f.deletion_vector,
            }
            for f in result.files
        ]
        return files, tuple(result.metadata.partition_columns) or self.partition_columns

    def partitions(self) -> list[_FileTask]:
        self._refresh_token = None
        self._delta_conf: dict = {}
        files, part_cols = self._file_actions()
        # only REST mode has a control plane to refresh expired URLs from
        rest = "files" not in self.options and _delta_path(self.options) is None
        refresh = dict(self.options) if rest else None
        if refresh is not None and self._refresh_token:
            refresh["__refreshToken"] = self._refresh_token
        raw_phys = self.options.get(
            "rowidphysical", self.options.get("rowIdPhysical")
        )
        if raw_phys:
            row_id_phys = tuple(json.loads(raw_phys))
        else:  # deltaPath mode: derive from the table configuration
            mat = self._delta_conf.get(
                "delta.rowTracking.materializedRowIdColumnName"
            )
            row_id_phys = (
                (
                    mat,
                    self._delta_conf.get(
                        "delta.rowTracking.materializedRowCommitVersionColumnName"
                    ),
                )
                if mat
                else None
            )
        return _build_tasks(
            files,
            part_cols,
            self.schema,
            self.pushed,
            refresh,
            # schema() gives the CDF branch precedence over row-id
            # columns — mirror it here, or a readChangeFeed+withRowIds
            # read would demand baseRowId from change actions that never
            # carry one and fail with a misleading error
            want_row_ids=_row_ids_enabled(self.options)
            and not _cdf_enabled(self.options),
            row_id_phys=row_id_phys,
        )

    # -- execution (runs on executors) ---------------------------------------

    def read(self, partition: _FileTask) -> Iterator[Any]:
        return _read_task(partition)


def _build_tasks(
    files: list[dict[str, Any]],
    part_cols: tuple[str, ...],
    schema: StructType,
    pushed: list[Filter],
    refresh: dict | None,
    want_row_ids: bool = False,
    row_id_phys: tuple | None = None,
) -> list[_FileTask]:
    """Driver-side task planning shared by the batch and streaming readers:
    partition + file-stats pruning, then one picklable task per file.

    Column-mapping tables (``delta.columnMapping.physicalName`` metadata in
    the schemaString) are normalized HERE, on the driver: add-action
    partitionValues and stats-JSON keys use PHYSICAL names, while pushed
    filters use LOGICAL names — both pruning passes remap to logical before
    comparing, and the executor task carries the mapping to read physical
    parquet columns and emit logical ones."""
    from duck_delta_share_spark.sources.schema import column_mapping

    base_schema = _strip_cdf_fields(schema)  # CDF columns are synthesized
    if want_row_ids:  # _row_id/_row_commit_version are synthesized too
        base_schema = StructType(
            [f for f in base_schema.fields if f.name not in ROW_ID_COLUMNS]
        )
    data_fields, part_fields = split_partition_fields(base_schema, part_cols)
    data_schema = StructType(data_fields)
    part_schema = StructType(part_fields)
    col_map = column_mapping(base_schema)
    from duck_delta_share_spark.sources.schema import has_nested_mapping

    nested_map = has_nested_mapping(base_schema)
    phys_to_logical = {p: l for l, p in (col_map or {}).items()}

    def to_logical_keys(d: dict) -> dict:
        if not col_map:
            return d
        return {phys_to_logical.get(k, k): v for k, v in d.items()}

    tasks: list[_FileTask] = []
    for f in files:
        pvals = to_logical_keys(f.get("partitionValues") or {})
        if not partition_matches(pushed, pvals):
            continue  # partition pruning: file never becomes a task
        stats_raw = f.get("stats") or ""
        if stats_raw:
            try:
                stats = json.loads(stats_raw) if isinstance(stats_raw, str) else stats_raw
            except ValueError:
                stats = {}
            if col_map and isinstance(stats, dict):
                stats = {
                    k: to_logical_keys(v) if isinstance(v, dict) else v
                    for k, v in stats.items()
                }
            if not stats_allow(pushed, stats):
                continue  # min/max stats pruning
        row_ids = None
        if want_row_ids:
            if f.get("baseRowId") is None:
                raise ValueError(
                    f"withRowIds read: file {f['url']} carries no baseRowId "
                    "(table not written with delta.enableRowTracking=true?)"
                )
            row_ids = (int(f["baseRowId"]), f.get("defaultRowCommitVersion"))
        tasks.append(
            _FileTask(
                url=f["url"],
                partition_values=pvals,
                data_schema_json=data_schema.json(),
                partition_schema_json=part_schema.json(),
                full_schema_json=schema.json(),
                file_id=f.get("id"),
                refresh=refresh,
                pushed=list(pushed),
                change=(f["action"], f["version"], f["timestamp"])
                if "action" in f
                else None,
                dv=f.get("deletionVector"),
                col_map=col_map,
                nested_map=nested_map,
                row_ids=row_ids,
                row_id_phys=row_id_phys if want_row_ids else None,
            )
        )
    return tasks


def _read_task(partition: _FileTask) -> Iterator[Any]:
    """Executor-side scan of one file task (batch and streaming share it)."""
    if partition is None:
        # partitions() legitimately returns [] when EVERY file is pruned
        # (stats/partition pruning, or an empty table) — Spark then still
        # schedules one task with a None partition; the scan is simply
        # empty (r7 fuzz: convert-scan of a fully-pruned table crashed
        # with AttributeError here instead of returning zero rows)
        return iter(())
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    data_schema = StructType.fromJson(json.loads(partition.data_schema_json))
    part_schema = StructType.fromJson(json.loads(partition.partition_schema_json))
    full_schema = StructType.fromJson(json.loads(partition.full_schema_json))
    arrow_full = to_arrow_schema(full_schema)

    from duck_delta_share_spark.sources.range_io import UrlExpiredError

    col_map = partition.col_map or {}
    cols = [col_map.get(f.name, f.name) for f in data_schema.fields]
    if partition.row_ids is not None and partition.row_id_phys:
        # materialized-row-id columns are hidden physical columns OUTSIDE
        # the table schema; _fetch_parquet intersects with the footer, so
        # files without them (plain appends) just skip the request
        cols = cols + [c for c in partition.row_id_phys if c]
    if partition.change and partition.change[0] == "cdf":
        # cdf-action files physically carry _change_type (update pre/post
        # images); add/remove files get it synthesized below.
        cols = cols + ["_change_type"]
    filters = partition.pushed or []
    if col_map and filters:
        # row-group pruning compares parquet column-chunk stats (PHYSICAL
        # names) against filter attributes — translate logical filters
        import dataclasses

        filters = [
            dataclasses.replace(
                flt, attribute=(col_map[flt.attribute[0]],) + tuple(flt.attribute[1:])
            )
            if getattr(flt, "attribute", None) and flt.attribute[0] in col_map
            else flt
            for flt in filters
        ]
    need_index = partition.dv is not None or partition.row_ids is not None
    try:
        table, row_index = _fetch_parquet(
            partition.url, cols, filters, want_row_index=need_index
        )
    except FileNotFoundError as ex:
        # a LOCAL file pinned by this task's snapshot vanished between
        # planning and read — VACUUM deleted it under an in-flight reader
        # or a time-travel read past the data-file retention window. The
        # one wrong response is silence: skipping the task would return a
        # silently smaller table (tests/test_vacuum_reader_race_r9.py).
        raise RuntimeError(
            f"data file {partition.url} is referenced by this scan's "
            "snapshot but no longer exists: it was deleted after the scan "
            "was planned (VACUUM under an in-flight reader, or time "
            "travel to a version whose files are past the retention "
            "window). Re-run the query from the latest snapshot; for "
            "long-running scans or deep time travel, raise the vacuum "
            "retain_hours above the scan/travel horizon."
        ) from ex
    except UrlExpiredError:
        # ONLY an expired presigned URL is refreshable; a 404 (file no
        # longer in the table) re-raising immediately avoids a
        # control-plane stampede of pointless re-queries (r1 #4).
        fresh = _refresh_url(partition)
        if fresh is None:
            raise
        try:
            table, row_index = _fetch_parquet(
                fresh, cols, filters, want_row_index=need_index
            )
        except UrlExpiredError:
            # the process-cached refreshed URL has ITSELF expired (second
            # expiry generation in a long job): force a fresh /query —
            # returning the stale cache entry again would fail every task
            # retry although one control-plane round-trip recovers
            fresh = _refresh_url(partition, skip_cache=True)
            if fresh is None:
                raise
            table, row_index = _fetch_parquet(
                fresh, cols, filters, want_row_index=need_index
            )

    if partition.dv is not None:
        # merge-on-read: mask deleted physical rows before emitting.
        # row_index carries GLOBAL file positions even when row-group
        # pruning skipped groups, so DV indexes line up exactly.
        import numpy as np

        from duck_delta_share_spark.sources.deletion_vectors import load_dv

        try:
            deleted = load_dv(partition.dv, "").astype(np.int64)
        except FileNotFoundError as ex:
            # the SUPERSEDED DV bin of a time-travel/pinned snapshot was
            # vacuumed (DV bins carry no remove tombstone — they age by
            # mtime). Emitting the file UNMASKED would silently
            # RESURRECT deleted rows — the one unacceptable response
            # (tests/test_dv_vacuum_race_r9.py).
            raise RuntimeError(
                f"deletion vector {partition.dv.get('pathOrInlineDv')} "
                f"for data file {partition.url} is referenced by this "
                "scan's snapshot but no longer exists (VACUUM reclaimed "
                "a superseded DV under an in-flight or time-travel "
                "read). Re-run from the latest snapshot, or raise "
                "vacuum retain_hours above the scan/travel horizon."
            ) from ex
        if len(deleted):
            keep = ~np.isin(row_index, deleted)
            table = table.filter(pa.array(keep))
            # keep _row_id aligned: surviving rows KEEP their physical
            # positions (row ids are stable under DV deletes)
            row_index = row_index[keep]

    if col_map:
        # emit LOGICAL names: relabel the physical parquet columns
        inv = {p: l for l, p in col_map.items()}
        table = table.rename_columns([inv.get(c, c) for c in table.column_names])
    if partition.nested_map:
        # NESTED struct fields carry their own physical names: zero-copy
        # view to the logical-named type (schema.relabel_nested_to_logical)
        from duck_delta_share_spark.sources.schema import (
            relabel_nested_to_logical,
        )

        table = relabel_nested_to_logical(table, data_schema)

    # Attach partition values as typed constant columns (the reference
    # never does this — §2D "partition values never re-attached").
    n = table.num_rows
    columns: dict[str, pa.Array] = {c: table.column(c) for c in table.column_names}
    for f in part_schema.fields:
        target = arrow_full.field(f.name).type
        raw = partition.partition_values.get(f.name)
        if raw is None:
            columns[f.name] = pa.nulls(n, type=target)
        else:
            # pa.repeat builds the constant column natively — no O(n)
            # Python list + per-element boxing on the executor hot path
            scalar = pa.scalar(_cast_partition_value(raw, target), type=target)
            columns[f.name] = pa.repeat(scalar, n)

    if partition.row_ids is not None:
        import pyarrow.compute as pc

        base, commit_v = partition.row_ids
        rid = pa.array(base + row_index, type=pa.int64())
        cv = (
            pa.repeat(pa.scalar(commit_v, type=pa.int64()), n)
            if commit_v is not None
            else pa.nulls(n, type=pa.int64())
        )
        phys = partition.row_id_phys or (None, None)
        if phys[0] and phys[0] in table.column_names:
            # preserved ids (written by OPTIMIZE) win over the fresh
            # baseRowId+index fallback, per the protocol's coalesce rule
            rid = pc.coalesce(pc.cast(table.column(phys[0]), pa.int64()), rid)
        if len(phys) > 1 and phys[1] and phys[1] in table.column_names:
            cv = pc.coalesce(pc.cast(table.column(phys[1]), pa.int64()), cv)
        columns["_row_id"] = rid
        columns["_row_commit_version"] = cv

    if partition.change is not None:
        action, version, ts_ms = partition.change
        if action != "cdf":
            columns["_change_type"] = pa.repeat(
                pa.scalar("insert" if action == "add" else "delete", pa.string()), n
            )
        columns["_commit_version"] = pa.repeat(pa.scalar(version, pa.int64()), n)
        columns["_commit_timestamp"] = pa.repeat(
            pa.scalar(ts_ms * 1000, arrow_full.field("_commit_timestamp").type), n
        )

    # Emit in declared schema order, casting data columns to the
    # declared types (presigned files may use narrower physical types).
    arrays = []
    for f in full_schema.fields:
        target = arrow_full.field(f.name).type
        # pre-evolution files lack later-added columns: emit typed nulls
        col = columns.get(f.name)
        if col is None:
            col = pa.nulls(n, type=target)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.type != target:
            col = col.cast(target)
        arrays.append(col)
    out = pa.table(dict(zip([f.name for f in full_schema.fields], arrays)))
    yield from out.to_batches(max_chunksize=1 << 16)


# Per-process (≈ per-executor) cache of refreshed presigned URLs: when N
# tasks in one python worker all hit expiry, the FIRST re-queries the
# control plane and the rest read the cached fresh URLs — one /query per
# executor, not per task (VERDICT r1 "What's wrong #4").
_REFRESH_CACHE: dict[tuple, dict[str, str]] = {}
# Latest refresh token per table (tokens rotate: each refresh response
# may carry a new one).
_REFRESH_TOKENS: dict[tuple, str] = {}


def _refresh_url(partition: _FileTask, skip_cache: bool = False) -> str | None:
    """Re-query the sharing server for a fresh presigned URL for this file
    (expired-URL recovery). Prefers the protocol's REFRESH-TOKEN flow
    (token-only /query — the server re-signs the same file list without
    re-planning predicate hints, VERDICT r3 #9); servers that issued no
    token get the full re-query. Returns None when not in REST mode or
    the file id is no longer present (e.g. table rewritten) — caller
    re-raises the original error."""
    if not partition.refresh or partition.file_id is None:
        return None
    options = partition.refresh
    share, schema, table = _parse_table_path(options.get("path"), options)
    version = options.get("versionasof", options.get("versionAsOf"))
    ts = options.get("timestampasof", options.get("timestampAsOf"))
    key = (options.get("endpoint", ""), share, schema, table, version, ts)
    cached = _REFRESH_CACHE.get(key, {}).get(partition.file_id)
    if not skip_cache and cached is not None and cached != partition.url:
        return cached  # another task in this process already refreshed
    client = _make_client(options)
    token = _REFRESH_TOKENS.get(key) or options.get("__refreshToken")
    result = None
    if token:
        from duck_delta_share_spark.client.rest import DeltaSharingError

        try:
            result = client.query_table(
                share, schema, table, refresh_token=token, include_refresh_token=True
            )
        except DeltaSharingError:
            # stale/unknown token (server restarted, token expired): the
            # full re-query below still recovers the read
            _REFRESH_TOKENS.pop(key, None)
    if result is None:
        result = client.query_table(
            share,
            schema,
            table,
            version=int(version) if version is not None else None,
            timestamp=ts if version is None else None,
        )
    if result.refresh_token:
        _REFRESH_TOKENS[key] = result.refresh_token
    _REFRESH_CACHE[key] = {f.id: f.url for f in result.files if f.id}
    return _REFRESH_CACHE[key].get(partition.file_id)


def _cast_partition_value(raw: str, target: "pa.DataType") -> Any:  # noqa: F821
    import datetime as dt

    import pyarrow as pa

    if pa.types.is_integer(target):
        return int(raw)
    if pa.types.is_floating(target):
        return float(raw)
    if pa.types.is_boolean(target):
        return str(raw).lower() == "true"
    if pa.types.is_date(target):
        return dt.date.fromisoformat(str(raw)[:10])
    if pa.types.is_timestamp(target):
        return dt.datetime.fromisoformat(str(raw).replace("Z", "+00:00")).replace(tzinfo=None)
    if pa.types.is_decimal(target):
        # pa.scalar refuses a str for decimal types ("int or Decimal
        # object expected") — a DECIMAL-partitioned table would crash
        # every scan without this branch
        import decimal

        return decimal.Decimal(raw)
    if pa.types.is_binary(target) or pa.types.is_fixed_size_binary(target):
        return str(raw).encode("utf-8")
    return str(raw)


def _fetch_parquet(
    url: str,
    columns: list[str],
    filters: list[Filter] | None = None,
    want_row_index: bool = False,
) -> tuple["pa.Table", Any]:  # noqa: F821
    """Read one parquet file: presigned http(s) URL or local path.

    http(s) uses RANGE reads (``range_io.HttpRangeFile``): one suffix
    request for the footer, then exactly the byte ranges of the projected
    column chunks in row groups surviving min/max pruning — egress scales
    with (columns read x rows matched), never bytes stored. Local paths
    get the same row-group pruning through pyarrow's own random access.

    Returns (table, row_index): with ``want_row_index``, row_index is the
    GLOBAL physical position of each returned row in the file (correct
    under row-group pruning — deletion vectors index physical file rows),
    else None.
    """
    import pyarrow.parquet as pq

    if url.startswith(("http://", "https://")):
        from duck_delta_share_spark.sources.range_io import HttpRangeFile

        f = HttpRangeFile(url)
        pf = pq.ParquetFile(f)
        # schema evolution: files written before a column was added simply
        # lack it — read what the file has; the task emit loop null-fills
        # the rest (pyarrow keeps num_rows for an empty column selection)
        columns = [c for c in columns if c in set(pf.schema_arrow.names)]
        keep = _select_row_groups(pf.metadata, filters or [])
        f.prefetch(_column_chunk_ranges(pf.metadata, keep, columns))
    else:
        path = url[7:] if url.startswith("file://") else url
        pf = pq.ParquetFile(path)
        columns = [c for c in columns if c in set(pf.schema_arrow.names)]
        keep = _select_row_groups(pf.metadata, filters or [])
    table = _read_groups(pf, keep, columns)
    if not want_row_index:
        return table, None
    import numpy as np

    md = pf.metadata
    group_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
    offsets = np.concatenate([[0], np.cumsum(group_rows)])
    row_index = (
        np.concatenate(
            [np.arange(offsets[i], offsets[i] + group_rows[i]) for i in keep]
        )
        if keep
        else np.empty(0, np.int64)
    )
    return table, row_index.astype(np.int64)


def _select_row_groups(md: Any, filters: list[Filter]) -> list[int]:
    """Row groups whose column-chunk min/max statistics admit the pushed
    filters (same conservative semantics as file-level ``stats_allow`` —
    unknown never prunes). Parquet writers truncate long string stats
    DOWNWARD for min / UPWARD for max, so truncation stays conservative."""
    if not filters:
        return list(range(md.num_row_groups))
    keep = []
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        mins: dict[str, Any] = {}
        maxs: dict[str, Any] = {}
        for j in range(rg.num_columns):
            col = rg.column(j)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes) or isinstance(mx, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except (UnicodeDecodeError, AttributeError):
                    continue  # non-UTF8 binary stats: no pruning info
            mins[col.path_in_schema] = mn
            maxs[col.path_in_schema] = mx
        if stats_allow(filters, {"minValues": mins, "maxValues": maxs}):
            keep.append(i)
    return keep


def _column_chunk_ranges(
    md: Any, row_groups: list[int], columns: list[str]
) -> list[tuple[int, int]]:
    """(offset, length) of each projected column chunk in the kept row
    groups — the exact bytes the scan needs beyond the footer."""
    wanted = set(columns)
    ranges: list[tuple[int, int]] = []
    for i in row_groups:
        rg = md.row_group(i)
        for j in range(rg.num_columns):
            col = rg.column(j)
            if col.path_in_schema.split(".")[0] not in wanted:
                continue
            offsets = [col.data_page_offset]
            if col.dictionary_page_offset is not None:
                offsets.append(col.dictionary_page_offset)
            ranges.append((min(offsets), col.total_compressed_size))
    return ranges


def _read_groups(pf: Any, keep: list[int], columns: list[str]) -> "pa.Table":  # noqa: F821
    if not keep:
        return pf.schema_arrow.empty_table().select(columns)
    if len(keep) == pf.metadata.num_row_groups:
        return pf.read(columns=columns)
    return pf.read_row_groups(keep, columns=columns)


# ---------------------------------------------------------------------------
# Streaming: table versions as micro-batch offsets
# ---------------------------------------------------------------------------


class DeltaShareStreamReader(DataSourceStreamReader):
    """Streaming twin of the scan: Delta table VERSIONS are the offsets.

    Each micro-batch covers a half-open version range [start, end): the
    driver asks the sharing server which files those commits added
    (``/changes``) and plans one task per file — the same per-file
    parallelism, pruning and range-read path as the batch scan
    (``_build_tasks`` / ``_read_task``). Offsets are checkpointed by Spark,
    so restarts resume exactly after the last committed version: each
    appended file is read exactly once.

    Options:

    - ``startingVersion``: first version to stream (e.g. ``1`` replays the
      table's whole retained history). Default ``latest``: only commits
      after the stream starts.
    - ``ignoreDeletes``: skip ``remove`` actions instead of failing. The
      default mirrors Delta's source: a delete in an append-only stream is
      an error (silently dropping it would desync downstream state).
    - ``readChangeFeed``: emit CDF rows (``_change_type`` /
      ``_commit_version`` / ``_commit_timestamp``) for add, remove AND cdf
      actions instead of append-only inserts.
    - ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``: admission control —
      cap how many added files / bytes one micro-batch admits (version
      granularity: whole commits are admitted until a cap would be
      exceeded, always at least one commit so the stream advances). The
      Python DataSource API has no SupportsAdmissionControl hook, so the
      cap is applied inside ``latestOffset``; the first trigger after a
      RESTART has no base offset to throttle from and admits everything
      pending (documented best-effort, steady-state batches are bounded).

    At 100 TB the control plane stays O(1) per trigger (one metadata GET in
    ``latestOffset``, one /changes GET per planned batch, plus one when
    rate-limiting); the data plane scales with files-per-commit across
    executors, never through the driver. The reference client has no
    streaming surface at all.
    """

    def __init__(self, options: dict[str, str], schema: StructType):
        self.options = options
        self.schema = schema
        self.delta_path = _delta_path(options)
        if self.delta_path is None:
            self.share, self.schema_name, self.table = _parse_table_path(
                options.get("path"), options
            )
        self.cdf = _cdf_enabled(options)
        raw = options.get("ignoredeletes", options.get("ignoreDeletes", ""))
        self.ignore_deletes = str(raw).lower() in ("true", "1")
        raw = options.get("ignorechanges", options.get("ignoreChanges", ""))
        # delta-spark semantics: ignoreChanges implies ignoreDeletes and
        # ADDITIONALLY admits the dataChange re-adds of update/DV-delete
        # rewrites (knowingly re-delivering the surviving rows)
        self.ignore_changes = str(raw).lower() in ("true", "1")
        if self.ignore_changes:
            self.ignore_deletes = True
        raw = options.get("failondataloss", options.get("failOnDataLoss", "true"))
        self.fail_on_data_loss = str(raw).lower() not in ("false", "0")
        # table identity captured in offsets: a dropped-and-recreated
        # table must not be silently misread against an old checkpoint
        self._tid: str | None = None
        self._tid_probed = False
        # stream-start schema signature (schemaString + partitioning +
        # the version it was read at): mid-stream metaData changes are
        # checked against this and FAIL FAST instead of silently binding
        # the old schema to new files
        self._schema_sig: str | None = None
        self._sig_part_cols: tuple[str, ...] | None = None
        self._sig_version: int | None = None
        mf = options.get("maxfilespertrigger", options.get("maxFilesPerTrigger"))
        mb = options.get("maxbytespertrigger", options.get("maxBytesPerTrigger"))
        self.max_files = int(mf) if mf else None
        self.max_bytes = int(mb) if mb else None
        self._last_end: int | None = None
        # partition columns are fixed for a stream's lifetime (Delta
        # treats repartitioning as a breaking change requiring a restart)
        # — cache them instead of replaying the FULL delta log every
        # micro-batch just to re-derive a constant
        self._part_cols: tuple[str, ...] | None = None
        # one-shot cache of the last /changes fetch: with admission
        # control, latestOffset and partitions would otherwise fetch
        # overlapping version ranges twice per trigger
        self._changes_cache: tuple[int, int, list, tuple[str, ...]] | None = None

    # driver-side ------------------------------------------------------------

    def _table_identity(self) -> str | None:
        if self._tid_probed:
            return self._tid
        self._tid_probed = True
        try:
            if self.delta_path is not None:
                from duck_delta_share_spark.sources.delta_log import snapshot

                snap = snapshot(self.delta_path)
                self._tid = snap.metadata_id
                self._schema_sig = snap.schema_string or None
                self._sig_part_cols = tuple(snap.partition_columns)
                self._sig_version = snap.version
            else:
                _, md = _make_client(self.options).query_table_metadata(
                    self.share, self.schema_name, self.table
                )
                self._tid = md.id or None
                self._schema_sig = md.schema_string or None
                self._sig_part_cols = tuple(md.partition_columns)
                self._sig_version = md.version if md.version >= 0 else None
        except Exception:
            self._tid = None  # id-less logs / legacy servers: no check
        return self._tid

    def _assert_stream_schema(
        self,
        schema_string: str | None,
        partition_columns,
        version,
    ) -> None:
        """Fail fast when table metadata observed in a streamed version
        range is incompatible with the schema this stream BOUND at start
        (Spark's Python DataSource binds schema once; silently reading
        newer files with the old schema would drop added columns, misread
        renamed/widened ones, or split rows across a repartitioning).

        Rules:

        - metaData NEWER than the stream-start version: ANY difference
          raises with a restart message (the restarted stream binds the
          new schema, so the advice actually resolves the error).
        - REPLAYED metaData (at or before stream start): compatible when
          every observed field matches a stream-start field by
          columnMapping id (renames are metadata-only — the physical
          parquet columns still resolve) or, without mapping ids, by
          name — with the same type either way. Purely-additive history
          stays readable (missing columns null, like the batch reader).
          An incompatible REPLAY is a property of the history, so the
          error says to advance startingVersion, NOT to restart (a
          restart would rebind the same schema and loop forever)."""
        self._table_identity()  # ensure the signature was probed
        sig = getattr(self, "_schema_sig", None)
        if not sig or not schema_string:
            return
        import json as _json

        if schema_string == sig:
            if (
                self._sig_part_cols is not None
                and partition_columns is not None
                and tuple(partition_columns) != self._sig_part_cols
            ):
                raise ValueError(
                    f"table partitioning changed at version {version} "
                    f"(stream-start {list(self._sig_part_cols)} -> "
                    f"{list(partition_columns)}); restart the stream with a "
                    "fresh checkpoint"
                )
            return
        sig_v = getattr(self, "_sig_version", None)
        if sig_v is not None and version is not None and int(version) > sig_v:
            # a metaData commit AFTER the version this stream bound its
            # schema at: any difference (add/rename/drop/retype) requires
            # a restart — even a drop, whose files would "read fine" as
            # nulls, desyncs downstream consumers of that column
            raise ValueError(
                f"table schema changed at version {version} (stream bound "
                f"its schema at version {sig_v}); restart the stream with "
                "a fresh checkpoint to bind the new schema"
            )
        try:
            base_fields = _json.loads(sig).get("fields", [])
            seen = _json.loads(schema_string).get("fields", [])
        except ValueError:
            return  # unparsable foreign schema: nothing sound to check

        def _map_id(f):
            return (f.get("metadata") or {}).get("delta.columnMapping.id")

        def _phys(f):
            return (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName"
            )

        base_by_name = {f["name"]: f.get("type") for f in base_fields}
        base_by_id = {
            _map_id(f): f.get("type")
            for f in base_fields
            if _map_id(f) is not None
        }
        # physicalName view of the bound schema: a field replayed from
        # BEFORE a column-mapping upgrade carries no mapping id, but its
        # files bind to the current schema through the physical column
        # name (the upgrade assigns physicalName = the then-current
        # logical name), so that is the sound match for it
        base_by_phys = {
            _phys(f): f.get("type") for f in base_fields if _phys(f)
        }
        bad = []
        for f in seen:
            fid = _map_id(f)
            if fid is not None and fid in base_by_id:
                # column-mapped field: renames are metadata-only (the
                # physical parquet column still resolves), so match by
                # mapping id and require only the type to agree
                if base_by_id[fid] != f.get("type"):
                    bad.append(f["name"])
            elif f["name"] in base_by_name:
                if base_by_name[f["name"]] != f.get("type"):
                    bad.append(f["name"])
            elif f["name"] in base_by_phys:
                if base_by_phys[f["name"]] != f.get("type"):
                    bad.append(f["name"])
            else:
                bad.append(f["name"])
        if bad:
            raise ValueError(
                f"replayed history is incompatible with the current table "
                f"schema: field(s) {bad} of the version-{version} metaData "
                "do not match the schema this stream bound at start "
                "(renamed/dropped/retyped without column mapping). "
                "Advance startingVersion past this change — restarting "
                "rebinds the same schema and hits this again."
            )
        if (
            self._sig_part_cols is not None
            and partition_columns is not None
            and tuple(partition_columns) != self._sig_part_cols
        ):
            raise ValueError(
                f"table partitioning changed at version {version} "
                f"(stream-start {list(self._sig_part_cols)} -> "
                f"{list(partition_columns)}); restart the stream with a "
                "fresh checkpoint"
            )

    def _current_version(self) -> int:
        if self.delta_path is not None:
            from duck_delta_share_spark.sources.delta_log import latest_version

            return latest_version(self.delta_path)
        client = _make_client(self.options)
        return client.query_table_version(self.share, self.schema_name, self.table)

    def initialOffset(self) -> dict:
        sv = self.options.get("startingversion", self.options.get("startingVersion"))
        if sv is None or str(sv).lower() == "latest":
            off = self._current_version() + 1
        else:
            off = int(sv)
        # never REGRESS the throttle base: the engine may probe
        # latestOffset before calling initialOffset, and a lower base here
        # would make the next latestOffset go backward past an offset the
        # engine already committed — which re-reads versions (duplicates)
        if self._last_end is None or off > self._last_end:
            self._last_end = off
        off_d = {"version": off}
        tid = self._table_identity()
        if tid:
            off_d["tableId"] = tid
        return off_d

    def latestOffset(self) -> dict:
        cur_excl = self._current_version() + 1
        # monotone guard on EVERY path (CLAUDE.md): a regressed version
        # probe (lagging replica, HEAD failover, directory swap) must not
        # hand the engine a backward offset — it would commit it and
        # re-read the regressed versions (duplicates) once the probe
        # recovers
        if self._last_end is not None and cur_excl < self._last_end:
            cur_excl = self._last_end

        def _off(v: int) -> dict:
            # EVERY offset carries the table identity: the committed end
            # offset becomes the next batch's start (and the restart
            # offset), so attaching the id only in initialOffset would
            # make the drop/recreate check dead after the first batch
            o = {"version": v}
            tid = self._table_identity()
            if tid:
                o["tableId"] = tid
            return o

        if self.max_files is None and self.max_bytes is None:
            self._last_end = cur_excl
            return _off(cur_excl)
        start = self._last_end
        if start is None or start >= cur_excl:
            # restarted stream: no base offset to throttle from — admit
            # everything pending once, cap from the next trigger on
            self._last_end = max(cur_excl, start or 0)
            return _off(self._last_end)
        raw, pc = self._changes(start, cur_excl - 1)
        self._changes_cache = (start, cur_excl - 1, raw, pc)
        by_version: dict[int, list[dict]] = {}
        for f in raw:
            if f["action"] in ("add", "cdf"):
                by_version.setdefault(int(f["version"]), []).append(f)
        admitted, n_files, n_bytes = start, 0, 0
        for v in range(start, cur_excl):
            acts = by_version.get(v, [])
            nf = len(acts)
            nb = sum(int(f.get("size") or 0) for f in acts)
            if admitted > start and (
                (self.max_files is not None and n_files + nf > self.max_files)
                or (self.max_bytes is not None and n_bytes + nb > self.max_bytes)
            ):
                break
            admitted, n_files, n_bytes = v + 1, n_files + nf, n_bytes + nb
        self._last_end = admitted
        return _off(admitted)

    def _changes(self, start: int, end_incl: int) -> tuple[list[dict], tuple[str, ...]]:
        """Raw per-commit file actions from either backend, in the same
        dict shape (url/id/partitionValues/stats/action/version/timestamp)."""
        if self.delta_path is not None:
            from duck_delta_share_spark.sources.delta_log import (
                snapshot,
                version_changes,
            )

            metas: list[tuple[int, dict]] = []
            files = version_changes(
                self.delta_path, start, end_incl, metadata_out=metas
            )
            for v, md in metas:
                self._assert_stream_schema(
                    md.get("schemaString"), md.get("partitionColumns"), v
                )
            if self._part_cols is None:
                self._part_cols = snapshot(self.delta_path).partition_columns
            return files, self._part_cols
        changes = _make_client(self.options).query_table_changes(
            self.share,
            self.schema_name,
            self.table,
            starting_version=start,
            ending_version=end_incl,
        )
        # the /changes response carries ONE metaData for the range — the
        # per-version granularity of the local path isn't available over
        # REST, so a mid-stream change surfaces on the trigger whose range
        # includes (or follows) it; still fail-fast, never bind-old-schema
        self._assert_stream_schema(
            changes.metadata.schema_string or None,
            changes.metadata.partition_columns,
            changes.metadata.version if changes.metadata.version >= 0 else None,
        )
        files = [
            {
                "url": a.file.url,
                "id": a.file.id,
                "partitionValues": dict(a.file.partition_values),
                "stats": a.file.stats,
                "action": a.action_type,
                "version": a.file.version,
                "timestamp": a.file.timestamp,
                "deletionVector": a.file.deletion_vector,
                "size": a.file.size,
            }
            for a in changes.actions
        ]
        return files, tuple(changes.metadata.partition_columns)

    def partitions(self, start: dict, end: dict) -> list[_FileTask]:
        # authoritative batch range from the engine: align the admission-
        # control base with it (covers restarts, where this instance never
        # saw the committed offset)
        if self._last_end is None or end["version"] > self._last_end:
            self._last_end = end["version"]
        if start["version"] >= end["version"]:
            return []
        cached = self._changes_cache
        self._changes_cache = None
        if (
            cached is not None
            and cached[0] == start["version"]
            and cached[1] >= end["version"] - 1
        ):
            # reuse the throttle pass's fetch for the admitted prefix —
            # one /changes (or local log read) per trigger, not two
            raw = [f for f in cached[2] if int(f["version"]) < end["version"]]
            part_cols = cached[3]
        else:
            raw, part_cols = self._changes(start["version"], end["version"] - 1)
        name = self.delta_path or f"{self.share}.{self.schema_name}.{self.table}"
        start_tid = start.get("tableId")
        cur_tid = self._table_identity()
        if start_tid and cur_tid and start_tid != cur_tid:
            # the checkpointed offsets belong to a DIFFERENT table
            # incarnation: silently continuing would skip the recreated
            # table's first `start` versions and splice two lineages
            raise ValueError(
                f"streaming checkpoint was created against table id "
                f"{start_tid} but {name} now has id {cur_tid} — the table "
                "was dropped and recreated; start the stream with a fresh "
                "checkpoint"
            )
        # versions whose commit REWROTE files (remove + dataChange add —
        # update_where / DV delete / merge): under ignoreDeletes alone the
        # re-add would re-deliver every surviving row of the file as fresh
        # inserts; delta-spark requires ignoreChanges to opt into that
        versions_with_removes = {
            int(f["version"]) for f in raw if f["action"] == "remove"
        }
        files = []
        for f in raw:
            if not self.cdf:
                if f["action"] == "remove":
                    if self.ignore_deletes:
                        continue
                    raise ValueError(
                        f"version {f['version']} of {name} removed file "
                        f"{f['id'] or f['url']!r}; this stream is append-only. "
                        "Set ignoreDeletes=true to skip deletes, or "
                        "readChangeFeed=true to consume them as CDF rows."
                    )
                if f["action"] == "cdf":
                    # change-materialized commits carry updates; without CDF
                    # columns requested we cannot represent them
                    raise ValueError(
                        f"version {f['version']} contains change-data files; "
                        "set readChangeFeed=true to stream them"
                    )
                if (
                    f["action"] == "add"
                    and int(f["version"]) in versions_with_removes
                    and not self.ignore_changes
                ):
                    raise ValueError(
                        f"version {f['version']} of {name} REWROTE data "
                        "(update/delete): its re-added files contain "
                        "already-delivered rows. Set ignoreChanges=true to "
                        "accept re-delivery of the surviving rows, or "
                        "readChangeFeed=true for precise change rows."
                    )
                f = {k: v for k, v in f.items() if k not in ("action", "version", "timestamp")}
            files.append(f)
        if not self.fail_on_data_loss and self.delta_path is not None:
            # recovery escape (delta-spark failOnDataLoss=false): files
            # vacuumed past retention while the stream was down would
            # otherwise wedge every restart with FileNotFoundError
            from pathlib import Path as _P

            present = [f for f in files if _P(f["url"]).exists()]
            if len(present) < len(files):
                import warnings

                warnings.warn(
                    f"failOnDataLoss=false: skipping {len(files) - len(present)} "
                    f"vacuumed file(s) in {name} versions "
                    f"[{start['version']}, {end['version']})",
                    RuntimeWarning,
                    stacklevel=2,
                )
            files = present
        refresh = dict(self.options) if self.delta_path is None else None
        return _build_tasks(files, part_cols, self.schema, [], refresh)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing server-side

    # executor-side ----------------------------------------------------------

    def read(self, partition: _FileTask) -> Iterator[Any]:
        return _read_task(partition)
