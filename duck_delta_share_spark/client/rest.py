"""Delta Sharing REST client: transport + endpoints.

Covers the reference client (`/root/reference/src/delta_sharing_client.cpp`):

- transport (cpp:86-161): GET/POST/HEAD with ``Authorization: Bearer``,
  ``Content-Type: application/json`` and
  ``delta-sharing-capabilities: responseformat=parquet`` headers; empty
  POST body sent as ``{}``; non-2xx mapped to an error carrying the JSON
  ``message`` when present (cpp:149-158).
- NDJSON (cpp:163-181): split lines, JSON-parse each.
- endpoints: list shares/schemas/tables/all-tables (+pagination via
  maxResults/pageToken, cpp:184-191), get share, table version, table
  metadata, table query (jsonPredicateHints / predicateHints / limitHint /
  version, cpp:371-465).

Uses stdlib ``urllib`` so the module stays dependency-free on executors;
retries with backoff on transient failures (the reference has none).

Deliberate deviations from reference quirks (SURVEY.md §2D): we never send
the junk ``predicateHints: ["string"]`` / ``version: 0`` placeholder fields
(cpp:382-384); hints are real or absent.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Iterable

from duck_delta_share_spark.client.models import (
    ChangeAction,
    FileAction,
    Protocol,
    Schema,
    Share,
    Table,
    TableChanges,
    TableFiles,
    TableMetadata,
)
from duck_delta_share_spark.client.profile import DeltaSharingProfile


class DeltaSharingError(RuntimeError):
    """HTTP or protocol-level error; carries status and server message."""

    def __init__(self, status: int, message: str, url: str = ""):
        super().__init__(f"HTTP {status}: {message}" + (f" ({url})" if url else ""))
        self.status = status
        self.server_message = message


def parse_ndjson(body: str) -> list[dict[str, Any]]:
    """Parse newline-delimited JSON (reference ParseNDJson, cpp:163-181)."""
    return [json.loads(line) for line in body.splitlines() if line.strip()]


# Reader surface this client implements. Classic parquet responses are
# minReaderVersion 1; via the delta response format (public protocol,
# `delta-sharing-capabilities: responseformat=delta`) we additionally read
# v2 (column mapping — translated in the shared scan path) and v3 tables
# whose readerFeatures are all in SUPPORTED_READER_FEATURES: deletion
# vectors are applied as executor-side row masks, timestampNtz needs no
# reader work. Anything else still fails fast — reading anyway would
# silently return wrong rows (the reference never checks the protocol at
# all, hpp:41-43, and returns deleted rows on DV tables).
MAX_SUPPORTED_READER_VERSION = 3
SUPPORTED_READER_FEATURES = frozenset(
    {
        "deletionVectors",
        "columnMapping",
        "timestampNtz",
        "v2Checkpoint",
        # demands no READ-time behavior (it obliges VACUUM implementations
        # to run the protocol gate) — a server forwarding it must not make
        # the scan path refuse the table
        "vacuumProtocolCheck",
    }
)


def check_protocol(protocol: Protocol, table: str = "") -> Protocol:
    """Fail fast on tables requiring reader features we don't implement."""
    tbl = f" {table!r}" if table else ""
    if protocol.min_reader_version > MAX_SUPPORTED_READER_VERSION:
        raise DeltaSharingError(
            0,
            f"table{tbl} requires Delta Sharing "
            f"minReaderVersion={protocol.min_reader_version}, but this client "
            f"supports up to {MAX_SUPPORTED_READER_VERSION}",
        )
    if protocol.min_reader_version >= 3:
        unsupported = set(protocol.reader_features) - SUPPORTED_READER_FEATURES
        if unsupported:
            raise DeltaSharingError(
                0,
                f"table{tbl} requires reader features {sorted(unsupported)} "
                "which this client does not implement (reading anyway would "
                "return wrong rows)",
            )
    return protocol


class DeltaSharingClient:
    """Synchronous Delta Sharing protocol client."""

    def __init__(
        self,
        profile: DeltaSharingProfile,
        max_retries: int = 3,
        timeout_sec: float = 60.0,
    ):
        self.profile = profile
        self.max_retries = max_retries
        self.timeout_sec = timeout_sec
        self._oauth = None
        if profile.uses_oauth:
            from duck_delta_share_spark.client.oauth import (
                OAuthClientCredentials,
            )

            self._oauth = OAuthClientCredentials(
                profile.token_endpoint,
                profile.client_id,
                profile.client_secret,
                scope=profile.scope,
                timeout_sec=timeout_sec,
            )

    # -- transport ----------------------------------------------------------

    def _bearer(self) -> str:
        return self._oauth.token() if self._oauth else self.profile.bearer_token

    def _headers(self, bearer: str | None = None) -> dict[str, str]:
        return {
            "Authorization": f"Bearer {bearer if bearer is not None else self._bearer()}",
            "Content-Type": "application/json",
            # The reference pins responseformat=parquet (cpp:124), which
            # limits it to minReaderVersion 1 tables. We additionally
            # advertise the delta response format + the reader features we
            # actually implement, so servers can share DV / column-mapping
            # tables with us (public protocol capabilities negotiation);
            # plain tables keep coming back in parquet format.
            "delta-sharing-capabilities": (
                "responseformat=parquet,delta;"
                "readerfeatures=deletionvectors,columnmapping,timestampntz"
            ),
        }

    def _request(
        self,
        method: str,
        path: str,
        query: dict[str, str] | None = None,
        body: dict[str, Any] | None = None,
        with_headers: bool = False,
        parse: str | None = None,
    ):
        """One HTTP exchange with retries. ``parse`` ∈ {None, "json",
        "ndjson"}: when set, the body is PARSED INSIDE the retry loop so a
        response truncated mid-line (a proxy closing a chunked stream
        early still reads as a clean EOF to urllib) is retried like any
        other transient failure instead of surfacing as a bare
        ``ValueError`` — or worse, being half-consumed by the caller."""
        import http.client

        url = self.profile.endpoint + path
        if query:
            url += "?" + urllib.parse.urlencode(query)
        data = None
        if method == "POST":
            data = json.dumps(body if body is not None else {}).encode()
        last_err: Exception | None = None
        retried_401 = False
        attempt = 0
        # while-loop, not `for attempt in range(...)`: the one OAuth 401
        # retry must NOT consume a transient-retry attempt — with a for
        # loop, a 401 landing on the final iteration (or max_retries=0)
        # would invalidate the cache and exit without ever sending the
        # freshly-fetched token (r8 self-review #1)
        while attempt <= self.max_retries:
            bearer = self._bearer()
            req = urllib.request.Request(
                url, data=data, headers=self._headers(bearer), method=method
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                    text = resp.read().decode()
                    try:
                        out: Any = text
                        if parse == "json":
                            out = json.loads(text)
                        elif parse == "ndjson":
                            out = parse_ndjson(text)
                    except ValueError as e:
                        last_err = DeltaSharingError(
                            0, f"unparsable {parse} response body "
                            f"(truncated mid-line?): {e}", url
                        )
                        if attempt < self.max_retries:
                            time.sleep(min(2**attempt * 0.2, 2.0))
                            attempt += 1
                            continue
                        raise last_err from None
                    return (out, dict(resp.headers)) if with_headers else out
            except urllib.error.HTTPError as e:
                raw = e.read().decode(errors="replace")
                message = raw
                try:
                    message = json.loads(raw).get("message", raw)
                except (ValueError, AttributeError):
                    pass
                err = DeltaSharingError(e.code, message, url)
                if e.code == 401 and self._oauth is not None and not retried_401:
                    # expired/revoked OAuth access token: drop the cache
                    # and retry ONCE with a freshly-fetched token (the
                    # headers are rebuilt per attempt). A second 401 means
                    # the credentials themselves are bad — surface it.
                    retried_401 = True
                    last_err = err
                    # keyed invalidation: only drop the token THIS request
                    # sent — another thread's already-refetched fresh token
                    # survives (oauth.py's conditional-drop contract).
                    # attempt is NOT incremented: the fresh-token retry
                    # must not consume a transient-retry slot.
                    self._oauth.invalidate(bearer)
                    continue
                if e.code in (429, 500, 502, 503, 504) and attempt < self.max_retries:
                    last_err = err
                    time.sleep(min(2**attempt * 0.2, 2.0))
                    attempt += 1
                    continue
                raise err from None
            except (OSError, http.client.HTTPException) as e:
                # URLError covers connect-phase failures only; read-phase
                # drops surface as TimeoutError / ConnectionResetError /
                # IncompleteRead — all transient, all retried, all mapped
                # to DeltaSharingError like the module contract promises
                last_err = DeltaSharingError(0, str(getattr(e, "reason", e)), url)
                if attempt < self.max_retries:
                    time.sleep(min(2**attempt * 0.2, 2.0))
                    attempt += 1
                    continue
                raise last_err from None
        raise last_err  # pragma: no cover

    def _paged_items(self, path: str, max_results: int | None = None) -> Iterable[dict[str, Any]]:
        """GET a listing endpoint, following nextPageToken pagination
        (reference only forwards caller paging params, cpp:184-191; we
        iterate to exhaustion)."""
        token: str | None = None
        for _ in range(10_000):  # same runaway-token bound as /query
            query: dict[str, str] = {}
            if max_results is not None:
                query["maxResults"] = str(max_results)
            if token:
                query["pageToken"] = token
            obj = self._request("GET", path, query or None, parse="json")
            yield from obj.get("items", [])
            token = obj.get("nextPageToken")
            if not token:
                return
        raise DeltaSharingError(
            0, "listing pagination exceeded 10000 pages (token loop?)", path
        )

    # -- catalog discovery (A1-A5) -------------------------------------------

    def list_shares(self, max_results: int | None = None) -> list[Share]:
        return [Share.from_json(o) for o in self._paged_items("/shares", max_results)]

    def get_share(self, name: str) -> Share:
        obj = self._request(
            "GET", f"/shares/{urllib.parse.quote(name, safe='')}", parse="json"
        )
        return Share.from_json(obj.get("share", obj))

    def list_schemas(self, share: str, max_results: int | None = None) -> list[Schema]:
        path = f"/shares/{urllib.parse.quote(share, safe='')}/schemas"
        return [Schema.from_json(o, share=share) for o in self._paged_items(path, max_results)]

    def list_tables(
        self, share: str, schema: str, max_results: int | None = None
    ) -> list[Table]:
        path = (
            f"/shares/{urllib.parse.quote(share, safe='')}"
            f"/schemas/{urllib.parse.quote(schema, safe='')}/tables"
        )
        return [
            Table.from_json(o, share=share, schema=schema)
            for o in self._paged_items(path, max_results)
        ]

    def list_all_tables(self, share: str, max_results: int | None = None) -> list[Table]:
        path = f"/shares/{urllib.parse.quote(share, safe='')}/all-tables"
        return [Table.from_json(o, share=share) for o in self._paged_items(path, max_results)]

    # -- table metadata / version (A6, A7) -----------------------------------

    def _table_path(self, share: str, schema: str, table: str) -> str:
        return (
            f"/shares/{urllib.parse.quote(share, safe='')}"
            f"/schemas/{urllib.parse.quote(schema, safe='')}"
            f"/tables/{urllib.parse.quote(table, safe='')}"
        )

    @staticmethod
    def _raise_if_both(version, timestamp):
        if version is not None and timestamp is not None:
            raise ValueError(
                "version and timestamp are mutually exclusive (public protocol)"
            )

    def query_table_metadata(
        self,
        share: str,
        schema: str,
        table: str,
        version: int | None = None,
        timestamp: str | None = None,
    ) -> tuple[Protocol, TableMetadata]:
        """GET .../metadata → NDJSON: line 0 protocol, line 1 metaData
        (cpp:305-355). The table VERSION travels in the
        ``Delta-Table-Version`` response header (classic parquet-format
        metaData bodies carry no version field) — captured here so the
        no-HEAD fallback of query_table_version returns a real version
        instead of -1."""
        import dataclasses

        self._raise_if_both(version, timestamp)
        lines, headers = self._request(
            "GET",
            self._table_path(share, schema, table) + "/metadata",
            # public protocol: version/timestamp query params return the
            # metadata AT that table version (time travel must read the
            # point-in-time SCHEMA, not the latest one); both together is
            # a caller error, same rule as query_table
            query=(
                {"version": str(version)}
                if version is not None
                else ({"timestamp": timestamp} if timestamp is not None else None)
            ),
            with_headers=True,
            parse="ndjson",
        )
        protocol: Protocol | None = None
        metadata: TableMetadata | None = None
        for line in lines:
            if "protocol" in line:
                protocol = check_protocol(Protocol.from_json(line["protocol"]), table)
            elif "metaData" in line:
                metadata = TableMetadata.from_json(line["metaData"])
        # the protocol REQUIRES both lines; a body cut cleanly at a line
        # boundary (truncating proxy) would otherwise bind an empty schema
        if protocol is None or metadata is None:
            raise DeltaSharingError(
                0,
                f"truncated metadata response for table {table!r}: missing "
                + ("protocol" if protocol is None else "metaData")
                + " line",
            )
        raw_v = headers.get("Delta-Table-Version") or headers.get(
            "delta-table-version"
        )
        if metadata.version < 0 and raw_v is not None:
            try:
                metadata = dataclasses.replace(metadata, version=int(raw_v))
            except ValueError:
                pass
        return protocol, metadata

    def _head_version(self, path: str) -> int | None:
        """HEAD the table endpoint and read ``Delta-Table-Version``.

        Servers that DON'T implement HEAD (404/405/501) or omit the header
        are remembered per client, so a polling streaming source doesn't
        pay one doomed HEAD before every metadata fetch, trigger after
        trigger. Transient failures (5xx, connection drops) are NOT
        cached — the next trigger retries the cheap path."""
        if getattr(self, "_head_unsupported", False):
            return None
        url = self.profile.endpoint + path
        req = urllib.request.Request(url, headers=self._headers(), method="HEAD")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                raw = resp.headers.get("Delta-Table-Version")
                if raw is None:
                    self._head_unsupported = True  # header not implemented
                    return None
                return int(raw)
        except urllib.error.HTTPError as e:
            if e.code in (404, 405, 501):
                self._head_unsupported = True  # HEAD not implemented
            return None
        except (urllib.error.URLError, OSError, ValueError):
            return None  # transient → fall back this trigger only

    def query_table_version(self, share: str, schema: str, table: str) -> int:
        """Table version probe — the protocol's cheap path: HEAD the table
        endpoint and read the ``Delta-Table-Version`` response header (no
        body, no NDJSON parse; the streaming source polls this every
        trigger). The reference HEADs but then IGNORES the header and
        re-fetches full metadata (cpp:357-369); we only fall back to the
        metadata GET when the server omits the header."""
        v = self._head_version(self._table_path(share, schema, table))
        if v is not None:
            return v
        _, metadata = self.query_table_metadata(share, schema, table)
        return metadata.version

    # -- table query (A8 REST half, A13, A14) ---------------------------------

    def query_table(
        self,
        share: str,
        schema: str,
        table: str,
        json_predicate_hints: dict[str, Any] | None = None,
        predicate_hints: list[str] | None = None,
        limit_hint: int | None = None,
        version: int | None = None,
        timestamp: str | None = None,
        max_files: int | None = None,
        include_refresh_token: bool = False,
        refresh_token: str | None = None,
    ) -> TableFiles:
        """POST .../query → protocol + metaData + file actions (cpp:371-465).

        Hints are advisory per the protocol: the server may ignore them, so
        the reader must (and does) re-apply every filter — unlike the
        reference, which drops filters from the plan (§2D filter swallowing).

        Paginated responses (public protocol: ``maxFiles``/``pageToken`` in
        the request, ``endStreamAction.nextPageToken`` in the response) are
        followed to exhaustion, so very large tables return their complete
        file list. The reference lacks this (cpp:371-465) and would
        silently scan only the first page.
        """
        base_body: dict[str, Any] = {}
        if refresh_token:
            # cheap refresh flow (public protocol): a token-only re-query
            # returns the SAME file list with fresh presigned URLs — no
            # hints, no re-planning on the server
            base_body["refreshToken"] = refresh_token
        else:
            if json_predicate_hints is not None:
                base_body["jsonPredicateHints"] = json.dumps(json_predicate_hints)
            if predicate_hints:
                base_body["predicateHints"] = predicate_hints
            if limit_hint is not None and limit_hint >= 0:
                base_body["limitHint"] = limit_hint
            self._raise_if_both(version, timestamp)
            if version is not None and version >= 0:
                base_body["version"] = version
            if timestamp is not None:
                base_body["timestamp"] = timestamp
        if max_files is not None and max_files > 0:
            base_body["maxFiles"] = max_files
        if include_refresh_token:
            base_body["includeRefreshToken"] = True
        path = self._table_path(share, schema, table) + "/query"
        protocol: Protocol | None = None
        metadata: TableMetadata | None = None
        files: list[FileAction] = []
        token: str | None = None
        new_refresh: str | None = None
        for _ in range(10_000):  # bound against a server echoing tokens forever
            body = dict(base_body)
            if token:
                # per the protocol, page requests repeat the original query
                # content plus the server-issued token
                body["pageToken"] = token
            lines = self._request("POST", path, body=body, parse="ndjson")
            token = None
            saw_esa = False
            for line in lines:
                if "protocol" in line:
                    protocol = check_protocol(Protocol.from_json(line["protocol"]), table)
                elif "metaData" in line:
                    metadata = TableMetadata.from_json(line["metaData"])
                elif "file" in line:
                    files.append(FileAction.from_json(line["file"]))
                elif "endStreamAction" in line:
                    saw_esa = True
                    esa = line["endStreamAction"]
                    token = esa.get("nextPageToken") or None
                    new_refresh = esa.get("refreshToken") or new_refresh
            # Anti-truncation guards: the protocol REQUIRES protocol +
            # metaData lines in every successful /query response, and an
            # endStreamAction line on every FOLLOW-UP page (the server
            # issued the pageToken, so it provably speaks pagination —
            # whereas a legacy server may legally IGNORE maxFiles /
            # includeRefreshToken on the first request and answer with a
            # complete, esa-less body). A body a proxy cut cleanly at a
            # line boundary fails these checks instead of silently
            # scanning a SHORT file list (the worst failure mode: correct-
            # looking results with missing rows).
            if protocol is None or metadata is None:
                raise DeltaSharingError(
                    0,
                    f"truncated /query response for table {table!r}: missing "
                    + ("protocol" if protocol is None else "metaData")
                    + " line",
                )
            if not saw_esa and "pageToken" in body:
                raise DeltaSharingError(
                    0,
                    f"truncated /query response for table {table!r}: a "
                    "pagination follow-up page has no endStreamAction "
                    "line — refusing a possibly-short file list",
                )
            if not token:
                return TableFiles(
                    protocol=protocol,
                    metadata=metadata,
                    files=tuple(files),
                    refresh_token=new_refresh,
                )
        raise DeltaSharingError(0, f"/query pagination did not terminate for {table}")

    # -- change data feed (beyond the reference: public /changes endpoint) ----

    def query_table_changes(
        self,
        share: str,
        schema: str,
        table: str,
        starting_version: int | None = None,
        ending_version: int | None = None,
        starting_timestamp: str | None = None,
        max_files: int | None = None,
    ) -> TableChanges:
        """GET .../changes → protocol + metaData + add/cdf/remove actions for
        the requested version range (inclusive both ends, per the public
        Delta Sharing protocol). The reference client has no CDF surface;
        this powers both ``readChangeFeed`` batch reads and the streaming
        source's per-microbatch file discovery. Paginated responses
        (maxFiles/pageToken → endStreamAction.nextPageToken) are followed
        to exhaustion, mirroring :meth:`query_table`."""
        base_query: dict[str, str] = {}
        if starting_version is not None:
            base_query["startingVersion"] = str(starting_version)
        if starting_timestamp is not None:
            base_query["startingTimestamp"] = starting_timestamp
        if ending_version is not None:
            base_query["endingVersion"] = str(ending_version)
        if max_files is not None and max_files > 0:
            base_query["maxFiles"] = str(max_files)
        path = self._table_path(share, schema, table) + "/changes"
        protocol: Protocol | None = None
        metadata: TableMetadata | None = None
        actions: list[ChangeAction] = []
        token: str | None = None
        for _ in range(10_000):
            query = dict(base_query)
            if token:
                query["pageToken"] = token
            lines = self._request("GET", path, query or None, parse="ndjson")
            token = None
            saw_esa = False
            for line in lines:
                if "protocol" in line:
                    protocol = check_protocol(Protocol.from_json(line["protocol"]), table)
                elif "metaData" in line:
                    metadata = TableMetadata.from_json(line["metaData"])
                elif "endStreamAction" in line:
                    saw_esa = True
                    token = line["endStreamAction"].get("nextPageToken") or None
                elif "file" in line and "deltaSingleAction" in line["file"]:
                    # delta response format: the wrapped single action's
                    # key (add/remove/cdc) is the change kind
                    kind, fa = FileAction.from_delta_action(line["file"])
                    actions.append(ChangeAction(kind, fa))
                else:
                    for kind in ("add", "cdf", "remove"):
                        if kind in line:
                            actions.append(
                                ChangeAction(kind, FileAction.from_json(line[kind]))
                            )
                            break
            # same anti-truncation guards as query_table: a change feed cut
            # short at a line boundary would silently DROP change actions —
            # a correctness bug for every CDF consumer downstream
            if protocol is None or metadata is None:
                raise DeltaSharingError(
                    0,
                    f"truncated /changes response for table {table!r}: "
                    "missing "
                    + ("protocol" if protocol is None else "metaData")
                    + " line",
                )
            if not saw_esa and "pageToken" in query:
                raise DeltaSharingError(
                    0,
                    f"truncated /changes response for table {table!r}: a "
                    "pagination follow-up page has no endStreamAction "
                    "line — refusing a possibly-short change list",
                )
            if not token:
                return TableChanges(
                    protocol=protocol, metadata=metadata, actions=tuple(actions)
                )
        raise DeltaSharingError(0, f"/changes pagination did not terminate for {table}")
