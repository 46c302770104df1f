"""In-process mock Delta Sharing server (stdlib http.server) serving canned
protocol responses shaped exactly like the reference's parsers expect
(FIXTURES.md §B; parser citations in delta_sharing_client.cpp:199-203,
317-348, 437-458), plus parquet file bytes for end-to-end scans."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "double", "nullable": True, "metadata": {}},
            {"name": "tag", "type": "string", "nullable": True, "metadata": {}},
            {"name": "pcol", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


class MockDeltaSharingServer:
    """share 'sales' / schema 'web' / table 'clicks': two files partitioned
    by pcol (eu/us), with min/max stats on id."""

    def __init__(self, data_dir: Path, token: str = "secret-token"):
        self.data_dir = data_dir
        self.token = token
        self.requests: list[tuple[str, str, str]] = []  # (method, path, body)
        self.httpd: HTTPServer | None = None
        self.port: int = 0
        # When True, the FIRST /query response hands out already-expired
        # presigned URLs (GET → 403); later queries return fresh ones —
        # simulates FileAction.expiration_timestamp passing mid-job.
        self.expire_first_query_urls = False
        # when set, /query paginates its file list N files per page even if
        # the client sends no maxFiles (servers may paginate unprompted)
        self.paginate_max_files = 0
        self._query_count = 0
        # Advertised protocol floor; tests bump it to 2+ to prove the
        # client refuses tables whose reader features it lacks.
        self.min_reader_version = 1
        # Delta response format mode (public protocol `responseformat=
        # delta`): /metadata + /query wrap actions as deltaProtocol /
        # deltaMetadata / deltaSingleAction, advertise minReaderVersion 3
        # with reader_features, and file actions carry the DV descriptors
        # in dv_descriptors (file name -> descriptor; pathOrInlineDv
        # typically a presigned /data/ URL of a .dv file in data_dir).
        self.dv_mode = False
        self.reader_features = ["deletionVectors"]
        self.dv_descriptors: dict[str, dict] = {}
        # last delta-sharing-capabilities header seen on a control request
        self.capability_headers: list[str] = []
        # HEAD version probe: serve the Delta-Table-Version header (set
        # False to emulate servers without it → client falls back to GET)
        self.serve_version_header = True
        # Range-request accounting for the range-read scan tests: every
        # satisfied Range header is logged, and data_bytes_served counts
        # actual payload bytes so tests can assert egress < object size.
        self.support_range = True
        self.range_requests: list[tuple[str, str]] = []
        self.data_bytes_served = 0
        # Fault injection: the next N control-plane requests answer 503
        # (transient overload) — clients must retry through it.
        self.fail_next = 0
        # OAuth client-credentials mode (shareCredentialsVersion 2):
        # /oauth/token issues short-lived access tokens; data/control
        # auth accepts any issued-and-not-revoked token instead of the
        # static bearer. Tests flip oauth_enabled and drive expiry via
        # oauth_expires_in / revoke_all_tokens().
        self.oauth_enabled = False
        self.oauth_client_id = "test-client"
        self.oauth_client_secret = "test-secret"
        self.oauth_expires_in = 3600
        self.oauth_tokens: list[str] = []
        self.oauth_revoked: set[str] = set()
        self.oauth_token_requests: list[dict] = []
        # Change-data-feed history, consistent with the version-3 snapshot
        # that /query serves: eu.parquet added at v1, us.parquet at v2,
        # v3 a data-free commit. append_version() grows it.
        self.table_version = 3
        self.change_log: list[dict] = [
            {"version": 1, "action": "add", "name": "eu.parquet", "id": "f-eu",
             "partitionValues": {"pcol": "eu"}, "size": 1000},
            {"version": 2, "action": "add", "name": "us.parquet", "id": "f-us",
             "partitionValues": {"pcol": "us"}, "size": 1000},
        ]

    def append_version(
        self,
        action: str,
        name: str,
        file_id: str,
        partition_values: dict | None = None,
        stats: str = "",
    ) -> int:
        """Commit one new table version containing a single action; returns
        the new version number. The parquet file must exist in data_dir."""
        self.table_version += 1
        self.change_log.append(
            {"version": self.table_version, "action": action, "name": name,
             "id": file_id, "partitionValues": partition_values or {},
             "size": 1000, "stats": stats}
        )
        return self.table_version

    # NDJSON /query and /metadata bodies -------------------------------------

    def _metadata_lines(self) -> str:
        meta = {
            "id": "tbl-1",
            "name": "clicks",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_STRING,
            "partitionColumns": ["pcol"],
            "configuration": {},
            "version": self.table_version,
        }
        if self.dv_mode:
            return "\n".join(
                [
                    json.dumps(
                        {
                            "protocol": {
                                "deltaProtocol": {
                                    "minReaderVersion": 3,
                                    "minWriterVersion": 7,
                                    "readerFeatures": self.reader_features,
                                    "writerFeatures": self.reader_features,
                                }
                            }
                        }
                    ),
                    json.dumps(
                        {
                            "metaData": {
                                "version": self.table_version,
                                "deltaMetadata": meta,
                            }
                        }
                    ),
                ]
            )
        return "\n".join(
            [
                json.dumps({"protocol": {"minReaderVersion": self.min_reader_version}}),
                json.dumps({"metaData": meta}),
            ]
        )

    def _wrap_file(self, f: dict) -> dict:
        """Classic parquet-format file dict -> delta-response-format line."""
        name = f["url"].split("/")[-1].split("?")[0]
        add = {
            "path": f["url"],
            "partitionValues": f["partitionValues"],
            "size": f["size"],
            "stats": f.get("stats", ""),
            "dataChange": True,
        }
        dv = self.dv_descriptors.get(name)
        if dv:
            add["deletionVector"] = dv
        return {
            "file": {
                "id": f["id"],
                "version": f.get("version", -1),
                "timestamp": f.get("timestamp", -1),
                "expirationTimestamp": f.get("expirationTimestamp", -1),
                "deltaSingleAction": {"add": add},
            }
        }

    def _query_lines(self, body: dict | None = None) -> str:
        self._query_count += 1
        body = body or {}
        is_refresh = bool(body.get("refreshToken"))
        if is_refresh and not str(body["refreshToken"]).startswith("rt-"):
            return json.dumps({"message": "unknown refresh token"})
        # token-only refresh requests always get fresh URLs
        expired = (
            self.expire_first_query_urls and self._query_count == 1 and not is_refresh
        )
        base = f"http://127.0.0.1:{self.port}/data"
        suffix = "?tok=expired" if expired else ""
        base_eu = f"{base}/eu.parquet{suffix}"
        base_us = f"{base}/us.parquet{suffix}"
        files = [
            {
                "url": base_eu,
                "id": "f-eu",
                "partitionValues": {"pcol": "eu"},
                "size": 1000,
                "stats": json.dumps(
                    {"numRecords": 3, "minValues": {"id": 1, "val": 1.0},
                     "maxValues": {"id": 3, "val": 3.0}}
                ),
                "version": 3,
                "timestamp": 1700000000000,
            },
            {
                "url": base_us,
                "id": "f-us",
                "partitionValues": {"pcol": "us"},
                "size": 1000,
                "stats": json.dumps(
                    {"numRecords": 3, "minValues": {"id": 10, "val": 10.0},
                     "maxValues": {"id": 12, "val": 12.0}}
                ),
                "version": 3,
                "timestamp": 1700000000000,
            },
        ]
        def file_line(f: dict) -> str:
            return json.dumps(self._wrap_file(f) if self.dv_mode else {"file": f})

        # protocol: when the client asks includeRefreshToken (or is already
        # refreshing), the final page's endStreamAction carries a (rotating)
        # refresh token
        want_rt = bool(body.get("includeRefreshToken")) or is_refresh
        rt = {"refreshToken": f"rt-{self._query_count}"} if want_rt else {}
        max_files = int(body.get("maxFiles", 0) or self.paginate_max_files or 0)
        if max_files:
            # paginated protocol: serve maxFiles files per page, hand out an
            # opaque nextPageToken (here: the next file offset) via
            # endStreamAction until the list is exhausted
            start = int(body.get("pageToken", 0) or 0)
            page = files[start : start + max_files]
            lines = [self._metadata_lines()]
            lines += [file_line(f) for f in page]
            nxt = start + max_files
            esa = {"nextPageToken": str(nxt)} if nxt < len(files) else dict(rt)
            lines.append(json.dumps({"endStreamAction": esa}))
            return "\n".join(lines)
        lines = [self._metadata_lines()] + [file_line(f) for f in files]
        if rt:
            lines.append(json.dumps({"endStreamAction": rt}))
        return "\n".join(lines)

    def _changes_lines(
        self, start: int, end: int, page_token: int = 0, max_files: int = 0
    ) -> str:
        acts = []
        for entry in self.change_log:
            if not (start <= entry["version"] <= end):
                continue
            f = {
                "url": f"http://127.0.0.1:{self.port}/data/{entry['name']}",
                "id": entry["id"],
                "partitionValues": entry["partitionValues"],
                "size": entry["size"],
                "timestamp": 1700000000000 + entry["version"] * 1000,
                "version": entry["version"],
            }
            if entry.get("stats"):
                f["stats"] = entry["stats"]
            if self.dv_mode:
                # delta response format: wrap as deltaSingleAction, Delta's
                # "cdc" spelling for change-data files
                kind = {"cdf": "cdc"}.get(entry["action"], entry["action"])
                inner = {
                    "path": f["url"],
                    "partitionValues": f["partitionValues"],
                    "size": f["size"],
                    "stats": f.get("stats", ""),
                    "dataChange": True,
                }
                dv = self.dv_descriptors.get(entry["name"])
                if dv:
                    inner["deletionVector"] = dv
                acts.append(
                    json.dumps(
                        {
                            "file": {
                                "id": f["id"],
                                "version": entry["version"],
                                "timestamp": f["timestamp"],
                                "deltaSingleAction": {kind: inner},
                            }
                        }
                    )
                )
            else:
                acts.append(json.dumps({entry["action"]: f}))
        max_files = max_files or self.paginate_max_files
        lines = [self._metadata_lines()]
        if max_files:
            page = acts[page_token : page_token + max_files]
            nxt = page_token + max_files
            esa = {"nextPageToken": str(nxt)} if nxt < len(acts) else {}
            return "\n".join(lines + page + [json.dumps({"endStreamAction": esa})])
        return "\n".join(lines + acts)

    # server ----------------------------------------------------------------

    def start(self) -> "MockDeltaSharingServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, status: int, body: bytes, ctype: str = "application/json"):
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _check_auth(self) -> bool:
                cap = self.headers.get("delta-sharing-capabilities")
                if cap is not None:
                    outer.capability_headers.append(cap)
                auth = self.headers.get("Authorization", "")
                if outer.oauth_enabled:
                    tok = auth.removeprefix("Bearer ")
                    ok = tok in outer.oauth_tokens and tok not in outer.oauth_revoked
                    if not ok:
                        self._reply(
                            401, json.dumps({"message": "invalid token"}).encode()
                        )
                        return False
                    return True
                if auth != f"Bearer {outer.token}":
                    self._reply(401, json.dumps({"message": "unauthorized"}).encode())
                    return False
                return True

            def do_GET(self):
                parsed = urlparse(self.path)
                path, qs = parsed.path, parse_qs(parsed.query)
                outer.requests.append(("GET", self.path, ""))
                if not path.startswith("/data/") and outer.fail_next > 0:
                    outer.fail_next -= 1
                    self._reply(503, json.dumps({"message": "try again"}).encode())
                    return
                if path.startswith("/data/"):
                    if qs.get("tok", [""])[0] == "expired":
                        self._reply(403, json.dumps({"message": "url expired"}).encode())
                        return
                    p = outer.data_dir / path.split("/")[-1].split("?")[0]
                    if not p.exists():
                        self._reply(404, json.dumps({"message": "no such file"}).encode())
                        return
                    data = p.read_bytes()
                    rng = self.headers.get("Range", "")
                    if outer.support_range and rng.startswith("bytes="):
                        outer.range_requests.append((path, rng))
                        start_s, _, end_s = rng[6:].partition("-")
                        size = len(data)
                        if start_s == "":  # suffix form bytes=-N
                            start = max(0, size - int(end_s))
                            end = size - 1
                        else:
                            start = int(start_s)
                            end = min(int(end_s), size - 1) if end_s else size - 1
                        chunk = data[start : end + 1]
                        outer.data_bytes_served += len(chunk)
                        self.send_response(206)
                        self.send_header("Content-Type", "application/octet-stream")
                        self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
                        self.send_header("Content-Length", str(len(chunk)))
                        self.end_headers()
                        self.wfile.write(chunk)
                        return
                    outer.data_bytes_served += len(data)
                    self._reply(200, data, "application/octet-stream")
                    return
                if not self._check_auth():
                    return
                if path == "/shares":
                    # two-page listing to exercise pagination
                    if qs.get("pageToken", [""])[0] == "p2":
                        body = {"items": [{"name": "marketing", "id": "sh-2"}]}
                    else:
                        body = {"items": [{"name": "sales", "id": "sh-1"}], "nextPageToken": "p2"}
                    self._reply(200, json.dumps(body).encode())
                elif path == "/shares/sales":
                    self._reply(200, json.dumps({"share": {"name": "sales", "id": "sh-1"}}).encode())
                elif path == "/shares/sales/schemas":
                    self._reply(
                        200,
                        json.dumps({"items": [{"name": "web", "share": "sales", "id": None}]}).encode(),
                    )
                elif path == "/shares/sales/schemas/web/tables":
                    self._reply(
                        200,
                        json.dumps(
                            {"items": [{"name": "clicks", "schema": "web", "share": "sales", "id": "t-1"}]}
                        ).encode(),
                    )
                elif path == "/shares/sales/all-tables":
                    self._reply(
                        200,
                        json.dumps(
                            {"items": [{"name": "clicks", "schema": "web", "share": "sales"}]}
                        ).encode(),
                    )
                elif path == "/shares/sales/schemas/web/tables/clicks/metadata":
                    self._reply(200, outer._metadata_lines().encode(), "application/x-ndjson")
                elif path == "/shares/sales/schemas/web/tables/clicks/changes":
                    start_q = qs.get("startingVersion", [""])[0]
                    if not start_q:
                        self._reply(
                            400,
                            json.dumps({"message": "startingVersion is required"}).encode(),
                        )
                        return
                    start = int(start_q)
                    end = int(qs.get("endingVersion", [str(outer.table_version)])[0])
                    if start > outer.table_version:
                        self._reply(
                            400,
                            json.dumps(
                                {"message": f"startingVersion {start} is after the "
                                 f"latest version {outer.table_version}"}
                            ).encode(),
                        )
                        return
                    self._reply(
                        200,
                        outer._changes_lines(
                            start,
                            end,
                            page_token=int(qs.get("pageToken", ["0"])[0] or 0),
                            max_files=int(qs.get("maxFiles", ["0"])[0] or 0),
                        ).encode(),
                        "application/x-ndjson",
                    )
                else:
                    self._reply(404, json.dumps({"message": f"not found: {path}"}).encode())

            def do_HEAD(self):
                outer.requests.append(("HEAD", self.path, ""))
                if self.headers.get("Authorization") != f"Bearer {outer.token}":
                    self.send_response(401)
                    self.end_headers()
                    return
                if self.path.split("?")[0] == "/shares/sales/schemas/web/tables/clicks":
                    self.send_response(200)
                    if outer.serve_version_header:
                        self.send_header(
                            "Delta-Table-Version", str(outer.table_version)
                        )
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                self.send_response(404)
                self.end_headers()

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode()
                outer.requests.append(("POST", self.path, body))
                if self.path == "/oauth/token":
                    # RFC 6749 §4.4 client-credentials grant (form body);
                    # NO bearer auth on the token endpoint itself
                    form = {k: v[0] for k, v in parse_qs(body).items()}
                    outer.oauth_token_requests.append(form)
                    if (
                        form.get("grant_type") != "client_credentials"
                        or form.get("client_id") != outer.oauth_client_id
                        or form.get("client_secret") != outer.oauth_client_secret
                    ):
                        self._reply(
                            401,
                            json.dumps({"error": "invalid_client"}).encode(),
                        )
                        return
                    tok = f"at-{len(outer.oauth_tokens)}"
                    outer.oauth_tokens.append(tok)
                    self._reply(
                        200,
                        json.dumps(
                            {
                                "access_token": tok,
                                "token_type": "Bearer",
                                "expires_in": outer.oauth_expires_in,
                            }
                        ).encode(),
                    )
                    return
                if not self._check_auth():
                    return
                if self.path == "/shares/sales/schemas/web/tables/clicks/query":
                    try:
                        parsed_body = json.loads(body) if body else {}
                    except ValueError:
                        parsed_body = {}
                    rt = parsed_body.get("refreshToken")
                    if rt and not str(rt).startswith("rt-"):
                        self._reply(
                            400,
                            json.dumps({"message": "unknown refresh token"}).encode(),
                        )
                        return
                    self._reply(
                        200,
                        outer._query_lines(parsed_body).encode(),
                        "application/x-ndjson",
                    )
                else:
                    self._reply(404, json.dumps({"message": f"not found: {self.path}"}).encode())

        self.httpd = HTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()
        return self

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def stop(self) -> None:
        if self.httpd:
            self.httpd.shutdown()

    def last_query_body(self) -> dict:
        for method, path, body in reversed(self.requests):
            if method == "POST" and path.endswith("/query"):
                return json.loads(body)
        return {}


def write_fixture_files(data_dir: Path) -> None:
    """Two parquet files WITHOUT the partition column (as Delta stores
    them), so the reader must attach pcol from partitionValues."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    data_dir.mkdir(parents=True, exist_ok=True)
    eu = pa.table({"id": pa.array([1, 2, 3], "int64"),
                   "val": pa.array([1.0, 2.0, 3.0], "float64"),
                   "tag": pa.array(["a", "b", "c"])})
    us = pa.table({"id": pa.array([10, 11, 12], "int64"),
                   "val": pa.array([10.0, 11.0, 12.0], "float64"),
                   "tag": pa.array(["x", "y", "z"])})
    pq.write_table(eu, data_dir / "eu.parquet")
    pq.write_table(us, data_dir / "us.parquet")
