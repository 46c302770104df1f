"""Minimal in-process Delta Sharing server for self-contained demos and
the driver's correctness gate.

Serves ONE table over the public protocol surface the client consumes:
``/metadata`` + ``/query`` (NDJSON; delta response format with
``deltaProtocol``/``deltaMetadata``/``deltaSingleAction`` lines whenever a
file carries a deletion-vector descriptor, classic parquet format
otherwise) and ``/data/<name>`` byte serving with HTTP Range support, so
the range-read scan path (`sources/range_io.py`) works end-to-end.

This exists because a DV-bearing *shared* table cannot be demonstrated
without a server: the descriptor's ``pathOrInlineDv`` must be a presigned
URL the executor fetches (the reference client has no DV surface at all
and silently returns deleted rows,
`/root/reference/src/delta_sharing_client.cpp:357-369`). The richer test
double with fault injection lives in ``tests/mock_server.py``; this one is
deliberately tiny and dependency-free (stdlib ``http.server``).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any


class MiniSharingServer:
    """One share/schema/table; ``files`` maps served name -> local path.

    ``file_actions`` is a list of dicts: {"name": <served file name>,
    "id": str, "partitionValues": dict, "stats": json str,
    "deletionVector": descriptor | None}.
    """

    def __init__(
        self,
        share: str,
        schema: str,
        table: str,
        schema_string: str,
        files: dict[str, Path],
        file_actions: list[dict[str, Any]],
        partition_columns: list[str] | None = None,
        token: str = "demo-token",
        version: int = 1,
    ):
        self.share, self.schema, self.table = share, schema, table
        self.schema_string = schema_string
        self.files = {k: Path(v) for k, v in files.items()}
        self.file_actions = file_actions
        self.partition_columns = partition_columns or []
        self.token = token
        self.version = version
        self.httpd: HTTPServer | None = None
        self.port = 0

    # -- NDJSON bodies -------------------------------------------------------

    def _dv_mode(self) -> bool:
        return any(a.get("deletionVector") for a in self.file_actions)

    def _meta(self) -> dict:
        return {
            "id": f"{self.share}.{self.schema}.{self.table}",
            "name": self.table,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": self.schema_string,
            "partitionColumns": self.partition_columns,
            "configuration": {},
            "version": self.version,
        }

    def _header_lines(self) -> list[str]:
        if self._dv_mode():
            return [
                json.dumps(
                    {
                        "protocol": {
                            "deltaProtocol": {
                                "minReaderVersion": 3,
                                "minWriterVersion": 7,
                                "readerFeatures": ["deletionVectors"],
                                "writerFeatures": ["deletionVectors"],
                            }
                        }
                    }
                ),
                json.dumps(
                    {"metaData": {"version": self.version, "deltaMetadata": self._meta()}}
                ),
            ]
        return [
            json.dumps({"protocol": {"minReaderVersion": 1}}),
            json.dumps({"metaData": self._meta()}),
        ]

    def _file_lines(self) -> list[str]:
        out = []
        for a in self.file_actions:
            url = f"{self.endpoint}/data/{a['name']}"
            if self._dv_mode():
                add = {
                    "path": url,
                    "partitionValues": a.get("partitionValues") or {},
                    "size": self.files[a["name"]].stat().st_size,
                    "stats": a.get("stats") or "",
                    "dataChange": True,
                }
                if a.get("deletionVector"):
                    add["deletionVector"] = a["deletionVector"]
                out.append(
                    json.dumps(
                        {
                            "file": {
                                "id": a.get("id") or a["name"],
                                "version": self.version,
                                "timestamp": 0,
                                "deltaSingleAction": {"add": add},
                            }
                        }
                    )
                )
            else:
                out.append(
                    json.dumps(
                        {
                            "file": {
                                "url": url,
                                "id": a.get("id") or a["name"],
                                "partitionValues": a.get("partitionValues") or {},
                                "size": self.files[a["name"]].stat().st_size,
                                "stats": a.get("stats") or "",
                            }
                        }
                    )
                )
        return out

    # -- server --------------------------------------------------------------

    def start(self) -> "MiniSharingServer":
        outer = self
        base = f"/shares/{self.share}/schemas/{self.schema}/tables/{self.table}"

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _reply(self, status: int, body: bytes, ctype="application/json"):
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = self.path.split("?")[0]
                if path.startswith("/data/"):
                    p = outer.files.get(path[len("/data/"):])
                    if p is None or not p.exists():
                        self._reply(404, b'{"message": "no such file"}')
                        return
                    size = p.stat().st_size
                    rng = self.headers.get("Range", "")
                    if rng.startswith("bytes="):
                        # seek + read the requested range only (a footer
                        # probe must not re-read the whole file), and
                        # reject malformed/out-of-range requests with 416
                        # instead of emitting an invalid 206 or crashing
                        try:
                            start_s, _, end_s = rng[6:].partition("-")
                            if start_s == "":
                                start = max(0, size - int(end_s))
                                end = size - 1
                            else:
                                start = int(start_s)
                                end = min(int(end_s), size - 1) if end_s else size - 1
                        except ValueError:
                            self._reply(416, b'{"message": "bad range"}')
                            return
                        if start >= size or start > end:
                            self.send_response(416)
                            self.send_header("Content-Range", f"bytes */{size}")
                            self.send_header("Content-Length", "0")
                            self.end_headers()
                            return
                        with open(p, "rb") as fh:
                            fh.seek(start)
                            chunk = fh.read(end - start + 1)
                        self.send_response(206)
                        self.send_header("Content-Type", "application/octet-stream")
                        self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
                        self.send_header("Content-Length", str(len(chunk)))
                        self.end_headers()
                        self.wfile.write(chunk)
                        return
                    self._reply(200, p.read_bytes(), "application/octet-stream")
                    return
                if self.headers.get("Authorization") != f"Bearer {outer.token}":
                    self._reply(401, b'{"message": "unauthorized"}')
                    return
                if path == base + "/metadata":
                    self._reply(
                        200,
                        "\n".join(outer._header_lines()).encode(),
                        "application/x-ndjson",
                    )
                    return
                self._reply(404, b'{"message": "not found"}')

            def do_POST(self):
                self.rfile.read(int(self.headers.get("Content-Length", 0)))
                if self.headers.get("Authorization") != f"Bearer {outer.token}":
                    self._reply(401, b'{"message": "unauthorized"}')
                    return
                if self.path.split("?")[0] == base + "/query":
                    body = "\n".join(outer._header_lines() + outer._file_lines())
                    self._reply(200, body.encode(), "application/x-ndjson")
                    return
                self._reply(404, b'{"message": "not found"}')

        # threaded: local[32] executors fetch ranges CONCURRENTLY — a
        # single-threaded server with a backlog of 5 serializes them and
        # drops connects under load (kernel SYN retransmit stalls)
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.httpd.daemon_threads = True
        self.port = self.httpd.server_address[1]
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()
        return self

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def stop(self) -> None:
        if self.httpd:
            self.httpd.shutdown()
            self.httpd.server_close()  # release the listening socket fd
