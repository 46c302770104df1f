"""Failure injection on the REST transport (VERDICT r5 #2a): mid-stream
5xx, responses truncated MID-LINE (unparsable) and truncated AT a line
boundary (parsable but incomplete), and short HTTP Range reads. The
invariant under test: the client either retries to a complete answer or
fails LOUDLY — it never returns a silently-short file/change list or
slices truncated bytes into the parquet reader.

The scripted server serves each request from a queue of canned responses;
truncated bodies are sent with a MATCHING Content-Length so urllib sees a
clean EOF (the proxy-rewrote-the-stream case — the only one that does not
already raise IncompleteRead in http.client)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from duck_delta_share_spark.client import (
    DeltaSharingClient,
    DeltaSharingError,
    DeltaSharingProfile,
)
from duck_delta_share_spark.sources.range_io import HttpRangeFile

PROTO = json.dumps({"protocol": {"minReaderVersion": 1}})
META = json.dumps(
    {
        "metaData": {
            "id": "tbl-1",
            "name": "clicks",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": [
                    {"name": "id", "type": "long", "nullable": True, "metadata": {}}
                ]}
            ),
            "partitionColumns": [],
            "configuration": {},
            "version": 3,
        }
    }
)


def file_line(fid: str) -> str:
    return json.dumps(
        {"file": {"url": f"http://x/{fid}.parquet", "id": fid,
                  "partitionValues": {}, "size": 10}}
    )


class ScriptedServer:
    """Pops one scripted (status, body, headers) per request, FIFO. When
    the script is empty, replies 500 so an over-eager client is loud."""

    def __init__(self):
        self.script: list[tuple[int, bytes, dict]] = []
        self.requests: list[tuple[str, str]] = []
        self.httpd: HTTPServer | None = None
        self.port = 0

    def push(self, status: int, body: bytes | str, headers: dict | None = None):
        if isinstance(body, str):
            body = body.encode()
        self.script.append((status, body, headers or {}))

    def start(self) -> "ScriptedServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _serve(self):
                outer.requests.append((self.command, self.path))
                if not outer.script:
                    status, body, headers = 500, b'{"message":"script empty"}', {}
                else:
                    status, body, headers = outer.script.pop(0)
                self.send_response(status)
                for k, v in headers.items():
                    self.send_header(k, v)
                # Content-Length always matches what we SEND — truncation
                # is modeled as a complete, shorter body (clean EOF)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            do_GET = do_POST = do_HEAD = _serve

        self.httpd = HTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()
        return self

    def stop(self):
        if self.httpd:
            self.httpd.shutdown()

    @property
    def endpoint(self):
        return f"http://127.0.0.1:{self.port}"


@pytest.fixture()
def srv():
    s = ScriptedServer().start()
    yield s
    s.stop()


@pytest.fixture()
def client(srv):
    return DeltaSharingClient(
        DeltaSharingProfile(endpoint=srv.endpoint, bearer_token="t"),
        max_retries=2,
    )


# -- truncated mid-line: retried as transient --------------------------------


def test_query_truncated_mid_line_retries_to_success(srv, client):
    full = "\n".join([PROTO, META, file_line("f1"), file_line("f2")])
    srv.push(200, full[: len(full) - 7])  # cut inside the last JSON line
    srv.push(200, full)
    tf = client.query_table("s", "sc", "t")
    assert [f.id for f in tf.files] == ["f1", "f2"]
    assert len(srv.requests) == 2  # one retry, not silent half-parse


def test_query_truncated_mid_line_persistent_fails_loud(srv, client):
    full = "\n".join([PROTO, META, file_line("f1")])
    for _ in range(3):  # max_retries=2 -> 3 attempts
        srv.push(200, full[: len(full) - 5])
    with pytest.raises(DeltaSharingError, match="unparsable"):
        client.query_table("s", "sc", "t")


def test_listing_truncated_json_retries(srv, client):
    body = json.dumps({"items": [{"name": "sales", "id": "sh-1"}]})
    srv.push(200, body[:-3])
    srv.push(200, body)
    assert [s.name for s in client.list_shares()] == ["sales"]


# -- truncated at a line boundary: structural guards -------------------------


def test_metadata_missing_metadata_line_fails_loud(srv, client):
    for _ in range(3):
        srv.push(200, PROTO)  # metaData line dropped at a clean boundary
    with pytest.raises(DeltaSharingError, match="missing metaData"):
        client.query_table_metadata("s", "sc", "t")


def test_query_missing_metadata_line_fails_loud(srv, client):
    srv.push(200, "\n".join([PROTO, file_line("f1")]))
    with pytest.raises(DeltaSharingError, match="missing metaData"):
        client.query_table("s", "sc", "t")


def test_first_page_without_esa_is_legal_legacy_ignore(srv, client):
    # a legacy server may IGNORE maxFiles/includeRefreshToken and answer
    # the first request with a complete esa-less body — that must be
    # accepted (only a follow-up page proves the server speaks pagination)
    srv.push(200, "\n".join([PROTO, META, file_line("f1"), file_line("f2")]))
    tf = client.query_table("s", "sc", "t", max_files=1,
                            include_refresh_token=True)
    assert [f.id for f in tf.files] == ["f1", "f2"]


def test_paginated_query_page2_truncated_fails_loud(srv, client):
    esa = json.dumps({"endStreamAction": {"nextPageToken": "p2"}})
    srv.push(200, "\n".join([PROTO, META, file_line("f1"), esa]))
    # page 2 arrives without its endStreamAction (cut at a line boundary)
    srv.push(200, "\n".join([PROTO, META, file_line("f2")]))
    with pytest.raises(DeltaSharingError, match="endStreamAction"):
        client.query_table("s", "sc", "t", max_files=1)


def test_unpaginated_legacy_response_still_accepted(srv, client):
    # no maxFiles/pageToken/includeRefreshToken -> legacy servers send no
    # endStreamAction and that must stay valid
    srv.push(200, "\n".join([PROTO, META, file_line("f1")]))
    tf = client.query_table("s", "sc", "t")
    assert [f.id for f in tf.files] == ["f1"]


def test_changes_page2_without_esa_fails_loud(srv, client):
    add = json.dumps({"add": {"url": "http://x/a.parquet", "id": "a",
                              "partitionValues": {}, "size": 1}})
    esa = json.dumps({"endStreamAction": {"nextPageToken": "p2"}})
    srv.push(200, "\n".join([PROTO, META, add, esa]))
    srv.push(200, "\n".join([PROTO, META, add]))  # follow-up page, no esa
    with pytest.raises(DeltaSharingError, match="endStreamAction"):
        client.query_table_changes("s", "sc", "t", starting_version=1,
                                   max_files=1)


def test_changes_missing_metadata_fails_loud(srv, client):
    srv.push(200, PROTO)
    with pytest.raises(DeltaSharingError, match="missing metaData"):
        client.query_table_changes("s", "sc", "t", starting_version=1)


# -- mid-stream 5xx on a later page: retried, complete result ---------------


def test_paginated_query_5xx_on_page2_retries_to_completion(srv, client):
    esa_next = json.dumps({"endStreamAction": {"nextPageToken": "p2"}})
    esa_done = json.dumps({"endStreamAction": {}})
    srv.push(200, "\n".join([PROTO, META, file_line("f1"), esa_next]))
    srv.push(503, json.dumps({"message": "overloaded"}))
    srv.push(200, "\n".join([PROTO, META, file_line("f2"), esa_done]))
    tf = client.query_table("s", "sc", "t", max_files=1)
    assert [f.id for f in tf.files] == ["f1", "f2"]


# -- short HTTP Range reads ---------------------------------------------------


def _range_headers(lo: int, hi: int, total: int) -> dict:
    return {"Content-Range": f"bytes {lo}-{hi}/{total}",
            "Content-Type": "application/octet-stream"}


def test_short_range_read_retries_then_succeeds(srv):
    payload = bytes(range(200)) * 5  # 1000 bytes
    tail = payload[-100:]
    # suffix request: first answer is SHORT (Content-Range says 100 bytes,
    # body has 40 — clean EOF), second is complete
    srv.push(206, tail[:40], _range_headers(900, 999, 1000))
    srv.push(206, tail, _range_headers(900, 999, 1000))
    f = HttpRangeFile(srv.endpoint + "/data.parquet", tail_length=100)
    assert f.size() == 1000
    f.seek(900)
    assert f.read(100) == tail
    assert len(srv.requests) == 2


def test_short_range_read_persistent_fails_loud(srv):
    tail = b"x" * 100
    for _ in range(3):
        srv.push(206, tail[:10], _range_headers(900, 999, 1000))
    with pytest.raises(IOError, match="short range read"):
        HttpRangeFile(srv.endpoint + "/data.parquet", tail_length=100)


def test_short_full_object_read_fails_loud(srv):
    # server without Range support: 200 full-object responses. A later
    # truncated 200 (proxy rewrote Content-Length) must not be sliced
    # into the reader as if complete — the object size from the initial
    # response is the contract.
    payload = bytes(range(251)) * 4  # 1004 bytes
    srv.push(200, payload)  # suffix request: whole object, size learned
    f = HttpRangeFile(srv.endpoint + "/d.parquet", tail_length=64)
    assert f.size() == 1004
    f._segments = []  # evict cache to force a re-fetch
    srv.push(200, payload[:300])  # truncated full-object re-fetch
    srv.push(200, payload[:300])
    srv.push(200, payload[:300])
    with pytest.raises(IOError, match="short full-object read"):
        f.seek(0)
        f.read(100)


def test_short_mid_file_range_read_never_reaches_parquet(srv):
    payload = bytes(range(256)) * 4  # 1024 bytes
    srv.push(206, payload[-64:], _range_headers(960, 1023, 1024))
    f = HttpRangeFile(srv.endpoint + "/d.parquet", tail_length=64)
    # column-chunk read: short 206 twice, then full
    want = payload[100:200]
    srv.push(206, want[:30], _range_headers(100, 199, 1024))
    srv.push(206, want[:99], _range_headers(100, 199, 1024))
    srv.push(206, want, _range_headers(100, 199, 1024))
    f.seek(100)
    assert f.read(100) == want
