"""Delta Sharing REST client tests against the in-process mock server
(reference behaviors cited in duck_delta_share_spark/client/rest.py)."""

from __future__ import annotations

import json

import pytest

from duck_delta_share_spark.client import (
    DeltaSharingClient,
    DeltaSharingError,
    DeltaSharingProfile,
)
from tests.mock_server import MockDeltaSharingServer, write_fixture_files


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("dsdata")
    write_fixture_files(data_dir)
    srv = MockDeltaSharingServer(data_dir).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    return DeltaSharingClient(
        DeltaSharingProfile(endpoint=server.endpoint + "/", bearer_token="secret-token")
    )


def test_profile_requires_endpoint_and_token():
    with pytest.raises(ValueError):
        DeltaSharingProfile(endpoint="", bearer_token="x")
    with pytest.raises(ValueError):
        DeltaSharingProfile(endpoint="http://x", bearer_token="")


def test_profile_strips_trailing_slash():
    p = DeltaSharingProfile(endpoint="http://x/", bearer_token="t")
    assert p.endpoint == "http://x"


def test_profile_from_file(tmp_path):
    f = tmp_path / "profile.json"
    f.write_text(
        json.dumps(
            {"shareCredentialsVersion": 1, "endpoint": "http://h/", "bearerToken": "tok"}
        )
    )
    p = DeltaSharingProfile.from_file(f)
    assert p.endpoint == "http://h" and p.bearer_token == "tok"


def test_list_shares_pagination(client):
    shares = client.list_shares()
    assert [s.name for s in shares] == ["sales", "marketing"]
    assert shares[0].id == "sh-1"


def test_get_share(client):
    assert client.get_share("sales").name == "sales"


def test_list_schemas_null_id_coalesced(client):
    schemas = client.list_schemas("sales")
    assert schemas[0].name == "web"
    assert schemas[0].share == "sales"
    assert schemas[0].id == ""  # null id → "" like extension.cpp:109-110


def test_list_tables(client):
    tables = client.list_tables("sales", "web")
    assert tables[0].name == "clicks"
    assert tables[0].share == "sales" and tables[0].schema == "web"


def test_list_all_tables(client):
    assert [t.name for t in client.list_all_tables("sales")] == ["clicks"]


def test_metadata_and_version(client):
    protocol, metadata = client.query_table_metadata("sales", "web", "clicks")
    assert protocol.min_reader_version == 1
    assert metadata.partition_columns == ("pcol",)
    assert metadata.version == 3
    assert "schemaString" not in metadata.schema_string  # raw inner JSON
    assert client.query_table_version("sales", "web", "clicks") == 3


def test_query_table_files_and_hints(client, server):
    hints = {"op": "equal", "children": []}
    result = client.query_table(
        "sales", "web", "clicks", json_predicate_hints=hints, limit_hint=10
    )
    assert len(result.files) == 2
    assert result.files[0].partition_values == {"pcol": "eu"}
    assert result.files[0].parsed_stats()["maxValues"]["id"] == 3
    body = server.last_query_body()
    assert json.loads(body["jsonPredicateHints"]) == hints
    assert body["limitHint"] == 10
    # no junk placeholder fields (reference quirk §2D)
    assert "predicateHints" not in body
    assert "version" not in body


def test_error_mapping(client):
    with pytest.raises(DeltaSharingError) as ei:
        client.get_share("nope")
    assert ei.value.status == 404
    assert "not found" in ei.value.server_message


def test_auth_error(server):
    bad = DeltaSharingClient(
        DeltaSharingProfile(endpoint=server.endpoint, bearer_token="wrong")
    )
    with pytest.raises(DeltaSharingError) as ei:
        bad.list_shares()
    assert ei.value.status == 401


def test_min_reader_version_gate(server, client):
    """A table requiring a reader version beyond the supported surface
    must fail fast, not be silently misread (reference parses the field
    and never checks it, hpp:41-43). v2 (column mapping) and v3 with
    supported readerFeatures are accepted since the delta response
    format landed; v4 and v3-with-unknown-features still refuse."""
    server.min_reader_version = 4
    try:
        with pytest.raises(DeltaSharingError, match="minReaderVersion=4"):
            client.query_table_metadata("sales", "web", "clicks")
        with pytest.raises(DeltaSharingError, match="minReaderVersion=4"):
            client.query_table("sales", "web", "clicks")
    finally:
        server.min_reader_version = 1
    protocol, _ = client.query_table_metadata("sales", "web", "clicks")
    assert protocol.min_reader_version == 1


def test_v3_unsupported_feature_refused(server, client):
    """minReaderVersion 3 is fine only when every readerFeature is
    implemented; e.g. v2Checkpoint-style unknowns must refuse."""
    server.dv_mode = True
    server.reader_features = ["deletionVectors", "madeUpFeature"]
    try:
        with pytest.raises(DeltaSharingError, match="madeUpFeature"):
            client.query_table("sales", "web", "clicks")
    finally:
        server.dv_mode = False
        server.reader_features = ["deletionVectors"]


def test_delta_format_parse_and_capabilities(server, client):
    """Delta response format: deltaProtocol/deltaMetadata/deltaSingleAction
    lines parse into the same models, DV descriptors surface on
    FileAction, and the client advertises the delta format + its reader
    features in delta-sharing-capabilities."""
    server.dv_mode = True
    server.dv_descriptors["eu.parquet"] = {
        "storageType": "p",
        "pathOrInlineDv": f"{server.endpoint}/data/eu.dv",
        "offset": 1,
        "sizeInBytes": 40,
        "cardinality": 1,
    }
    try:
        result = client.query_table("sales", "web", "clicks")
        assert result.protocol.min_reader_version == 3
        assert "deletionVectors" in result.protocol.reader_features
        assert result.metadata.schema_string  # deltaMetadata unwrapped
        by_id = {f.id: f for f in result.files}
        assert by_id["f-eu"].deletion_vector["pathOrInlineDv"].endswith("eu.dv")
        assert by_id["f-us"].deletion_vector is None
        assert by_id["f-eu"].url.endswith("eu.parquet")
        cap = server.capability_headers[-1]
        assert "delta" in cap and "deletionvectors" in cap
    finally:
        server.dv_mode = False
        server.dv_descriptors.clear()


def test_version_probe_uses_head_header(server, client):
    """query_table_version reads Delta-Table-Version from a HEAD (the
    reference HEADs and then ignores the header, re-fetching metadata —
    cpp:357-369); servers without the header get the GET fallback."""
    n0 = len(server.requests)
    assert client.query_table_version("sales", "web", "clicks") == server.table_version
    reqs = server.requests[n0:]
    assert [m for m, _, _ in reqs] == ["HEAD"], reqs
    server.serve_version_header = False
    try:
        n1 = len(server.requests)
        assert client.query_table_version("sales", "web", "clicks") == server.table_version
        methods = [m for m, _, _ in server.requests[n1:]]
        assert methods == ["HEAD", "GET"], methods  # fallback path
    finally:
        server.serve_version_header = True


def test_refresh_token_flow(server, client):
    """includeRefreshToken yields a token; a token-only re-query returns
    the same files with fresh URLs and rotates the token — the cheap
    expiry-recovery path (one control-plane call, no hint re-planning)."""
    first = client.query_table(
        "sales", "web", "clicks",
        json_predicate_hints={"op": "isNull", "children": []},
        include_refresh_token=True,
    )
    assert first.refresh_token == f"rt-{server._query_count}"
    refreshed = client.query_table(
        "sales", "web", "clicks",
        refresh_token=first.refresh_token,
        include_refresh_token=True,
    )
    body = server.last_query_body()
    assert body.get("refreshToken") == first.refresh_token
    assert "jsonPredicateHints" not in body  # token replaces the plan
    assert {f.id for f in refreshed.files} == {f.id for f in first.files}
    assert refreshed.refresh_token and refreshed.refresh_token != first.refresh_token


def test_changes_delta_format_parse(server, client):
    """/changes in the delta response format: deltaSingleAction-wrapped
    add/remove/cdc lines parse into the same ChangeAction stream (cdc
    normalized to 'cdf'), carrying version/timestamp and DV descriptors."""
    server.dv_mode = True
    server.change_log.append(
        {"version": 4, "action": "remove", "name": "eu.parquet", "id": "f-eu",
         "partitionValues": {"pcol": "eu"}, "size": 1000}
    )
    server.change_log.append(
        {"version": 5, "action": "cdf", "name": "us.parquet", "id": "f-us",
         "partitionValues": {"pcol": "us"}, "size": 1000}
    )
    server.table_version = 5
    try:
        ch = client.query_table_changes("sales", "web", "clicks", starting_version=1)
        kinds = [(a.action_type, a.file.id, a.file.version) for a in ch.actions]
        assert kinds == [
            ("add", "f-eu", 1),
            ("add", "f-us", 2),
            ("remove", "f-eu", 4),
            ("cdf", "f-us", 5),
        ]
        assert all(a.file.url.endswith(".parquet") for a in ch.actions)
    finally:
        server.dv_mode = False
        server.change_log = server.change_log[:-2]
        server.table_version = 3


def test_query_table_pagination_client_requested(client, server):
    """maxFiles → server pages the file list; the client follows
    endStreamAction.nextPageToken to exhaustion and repeats the original
    query content on every page request."""
    hints = {"op": "equal", "children": []}
    result = client.query_table(
        "sales", "web", "clicks", json_predicate_hints=hints, max_files=1
    )
    assert [f.id for f in result.files] == ["f-eu", "f-us"]
    page_bodies = [
        json.loads(b)
        for m, p, b in server.requests
        if m == "POST" and p.endswith("/query") and "maxFiles" in (b or "{}")
    ][-2:]
    assert all(b["maxFiles"] == 1 for b in page_bodies)
    assert "pageToken" not in page_bodies[0]
    assert page_bodies[1]["pageToken"] == "1"
    # original query content repeated on the page request (per protocol)
    assert json.loads(page_bodies[1]["jsonPredicateHints"]) == hints


def test_query_table_pagination_server_forced(client, server):
    """Servers may paginate unprompted — the complete file list must still
    come back (the reference would silently scan page 1 only)."""
    server.paginate_max_files = 1
    try:
        result = client.query_table("sales", "web", "clicks")
        assert [f.id for f in result.files] == ["f-eu", "f-us"]
    finally:
        server.paginate_max_files = 0


def test_query_table_changes_pagination(client, server):
    """CDF reads follow endStreamAction.nextPageToken on /changes too."""
    full = client.query_table_changes("sales", "web", "clicks", starting_version=0)
    server.paginate_max_files = 1
    try:
        paged = client.query_table_changes(
            "sales", "web", "clicks", starting_version=0
        )
    finally:
        server.paginate_max_files = 0
    assert len(full.actions) > 1  # the fixture log has several versions
    assert [(a.action_type, a.file.id) for a in paged.actions] == [
        (a.action_type, a.file.id) for a in full.actions
    ]


def test_path_quoting_escapes_slash():
    """Share/schema/table names containing '/' must round-trip as ONE path
    segment (self-review r5: default quote keeps '/' unescaped and the
    server would route the wrong resource)."""
    from duck_delta_share_spark.client.rest import DeltaSharingClient as C

    c = C(DeltaSharingProfile(endpoint="http://x", bearer_token="t"))
    p = c._table_path("a/b", "s c", "t/u")
    assert p == "/shares/a%2Fb/schemas/s%20c/tables/t%2Fu"


def test_delta_action_null_numeric_fields_parse():
    """Explicit JSON nulls in optional numeric fields (remove.size is
    optional per the Delta spec) parse instead of raising TypeError."""
    from duck_delta_share_spark.client.models import FileAction

    kind, fa = FileAction.from_delta_action(
        {
            "id": "f1",
            "version": None,
            "timestamp": None,
            "expirationTimestamp": None,
            "deltaSingleAction": {
                "remove": {"path": "http://u", "size": None}
            },
        }
    )
    assert kind == "remove" and fa.size == 0 and fa.version == -1


def test_profile_rejects_unsupported_credentials_version(tmp_path):
    prof = tmp_path / "p.json"
    prof.write_text(
        json.dumps(
            {
                "shareCredentialsVersion": 2,
                "endpoint": "http://x",
                "tokenEndpoint": "http://oauth",
            }
        )
    )
    with pytest.raises(ValueError, match="shareCredentialsVersion 2"):
        DeltaSharingProfile.from_file(prof)


def test_metadata_get_carries_version_header(client, server):
    """query_table_metadata captures Delta-Table-Version from the response
    HEADERS (classic parquet-format metaData bodies carry no version), so
    the no-HEAD fallback of query_table_version never returns -1."""
    _, md = client.query_table_metadata("sales", "web", "clicks")
    assert md.version >= 0


def test_head_unsupported_cached(client, server, monkeypatch):
    """After a header-less HEAD the client stops HEAD-ing (one doomed
    probe per POLLING TRIGGER otherwise); transient errors don't cache."""
    calls = {"n": 0}
    import urllib.request as _ur

    real = _ur.urlopen

    def counting(req, *a, **kw):
        if getattr(req, "method", None) == "HEAD" or (
            hasattr(req, "get_method") and req.get_method() == "HEAD"
        ):
            calls["n"] += 1
        return real(req, *a, **kw)

    monkeypatch.setattr(_ur, "urlopen", counting)
    client._head_unsupported = True  # pretend a prior probe failed 405
    v1 = client.query_table_version("sales", "web", "clicks")
    assert calls["n"] == 0  # no HEAD issued while cached
    assert v1 >= 0  # fallback still returns a real version (header GET)
    client._head_unsupported = False
    v2 = client.query_table_version("sales", "web", "clicks")
    assert calls["n"] == 1 and v2 == v1
