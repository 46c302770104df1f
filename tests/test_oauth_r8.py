"""shareCredentialsVersion 2 (OAuth client credentials) — r8.

Profile parsing for both v2 types, the token manager's cache/expiry/
invalidate discipline (fake clock), and mock-server e2e: a v2-profile
REST scan, lazy single fetch reused across requests, expiry-driven
refresh, and revocation recovered via the 401 retry-once path.
"""

from __future__ import annotations

import json

import pytest

from duck_delta_share_spark.client import DeltaSharingClient, DeltaSharingProfile
from duck_delta_share_spark.client.oauth import OAuthClientCredentials, OAuthError
from tests.mock_server import MockDeltaSharingServer, write_fixture_files


@pytest.fixture()
def oauth_server(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("oauthdata")
    write_fixture_files(data_dir)
    srv = MockDeltaSharingServer(data_dir).start()
    srv.oauth_enabled = True
    yield srv
    srv.stop()


def _v2_profile(tmp_path, srv, secret=None):
    f = tmp_path / "profile.json"
    f.write_text(
        json.dumps(
            {
                "shareCredentialsVersion": 2,
                "type": "oauth_client_credentials",
                "endpoint": srv.endpoint,
                "tokenEndpoint": srv.endpoint + "/oauth/token",
                "clientId": srv.oauth_client_id,
                "clientSecret": secret or srv.oauth_client_secret,
            }
        )
    )
    return f


# -- profile parsing ----------------------------------------------------------


def test_profile_v2_oauth_from_file(tmp_path):
    f = tmp_path / "p.json"
    f.write_text(
        json.dumps(
            {
                "shareCredentialsVersion": 2,
                "type": "oauth_client_credentials",
                "endpoint": "http://x/",
                "tokenEndpoint": "http://x/oauth/token",
                "clientId": "cid",
                "clientSecret": "cs",
                "scope": "sharing",
            }
        )
    )
    p = DeltaSharingProfile.from_file(f)
    assert p.uses_oauth and p.endpoint == "http://x"
    assert (p.client_id, p.client_secret, p.scope) == ("cid", "cs", "sharing")


def test_profile_v2_bearer_type_from_file(tmp_path):
    f = tmp_path / "p.json"
    f.write_text(
        json.dumps(
            {
                "shareCredentialsVersion": 2,
                "type": "bearer_token",
                "endpoint": "http://x",
                "bearerToken": "tok",
            }
        )
    )
    p = DeltaSharingProfile.from_file(f)
    assert not p.uses_oauth and p.bearer_token == "tok"


def test_profile_v2_unknown_type_fails_loud(tmp_path):
    f = tmp_path / "p.json"
    f.write_text(
        json.dumps(
            {"shareCredentialsVersion": 2, "type": "magic", "endpoint": "http://x"}
        )
    )
    with pytest.raises(ValueError, match="magic"):
        DeltaSharingProfile.from_file(f)


def test_profile_oauth_requires_client_credentials():
    with pytest.raises(ValueError, match="clientId"):
        DeltaSharingProfile(endpoint="http://x", token_endpoint="http://t")


# -- token manager (fake clock, no network beyond the mock) -------------------


def test_token_cached_until_leeway_then_refetched(oauth_server):
    now = [0.0]
    mgr = OAuthClientCredentials(
        oauth_server.endpoint + "/oauth/token",
        oauth_server.oauth_client_id,
        oauth_server.oauth_client_secret,
        clock=lambda: now[0],
    )
    oauth_server.oauth_expires_in = 600
    t1 = mgr.token()
    now[0] = 500.0  # inside expiry - 60s leeway
    assert mgr.token() == t1 and mgr.fetch_count == 1
    now[0] = 545.0  # past the leeway boundary (600 - 60)
    t2 = mgr.token()
    assert t2 != t1 and mgr.fetch_count == 2


def test_very_short_tokens_keep_half_their_lifetime(oauth_server):
    now = [0.0]
    mgr = OAuthClientCredentials(
        oauth_server.endpoint + "/oauth/token",
        oauth_server.oauth_client_id,
        oauth_server.oauth_client_secret,
        clock=lambda: now[0],
    )
    oauth_server.oauth_expires_in = 10  # leeway clamps to 5, not 60
    t1 = mgr.token()
    now[0] = 4.0
    assert mgr.token() == t1
    now[0] = 6.0
    assert mgr.token() != t1


def test_invalidate_is_conditional_on_the_rejected_token(oauth_server):
    now = [0.0]
    mgr = OAuthClientCredentials(
        oauth_server.endpoint + "/oauth/token",
        oauth_server.oauth_client_id,
        oauth_server.oauth_client_secret,
        clock=lambda: now[0],
    )
    t1 = mgr.token()
    mgr.invalidate(t1)
    t2 = mgr.token()
    assert t2 != t1
    mgr.invalidate(t1)  # stale invalidation: t2 must survive
    assert mgr.token() == t2


def test_bad_client_secret_fails_loud(oauth_server):
    mgr = OAuthClientCredentials(
        oauth_server.endpoint + "/oauth/token",
        oauth_server.oauth_client_id,
        "wrong-secret",
    )
    with pytest.raises(OAuthError, match="401"):
        mgr.token()


# -- e2e against the mock server ----------------------------------------------


def test_v2_profile_client_lists_and_queries(tmp_path, oauth_server):
    c = DeltaSharingClient(
        DeltaSharingProfile.from_file(_v2_profile(tmp_path, oauth_server))
    )
    shares = c.list_shares()
    assert "sales" in [s.name for s in shares]
    md = c.query_table_metadata("sales", "web", "clicks")
    assert md is not None
    # ONE lazy token fetch reused across both control-plane requests
    assert len(oauth_server.oauth_token_requests) == 1
    assert oauth_server.oauth_token_requests[0]["grant_type"] == "client_credentials"


def test_revoked_token_recovers_via_401_retry(tmp_path, oauth_server):
    c = DeltaSharingClient(
        DeltaSharingProfile.from_file(_v2_profile(tmp_path, oauth_server))
    )
    assert c.list_shares()
    # server-side revocation: the cached token starts answering 401
    oauth_server.oauth_revoked.update(oauth_server.oauth_tokens)
    shares = c.list_shares()  # must invalidate + refetch + succeed
    assert "sales" in [s.name for s in shares]
    assert len(oauth_server.oauth_token_requests) == 2


def test_wrong_credentials_surface_the_oauth_error(tmp_path, oauth_server):
    c = DeltaSharingClient(
        DeltaSharingProfile.from_file(
            _v2_profile(tmp_path, oauth_server, secret="nope")
        )
    )
    with pytest.raises(OAuthError, match="401"):
        c.list_shares()


def test_v2_profile_rest_scan(spark, tmp_path, oauth_server):
    """The verdict's done-criterion: a v2-profile scan green against the
    mock server, through the deltashare DataSource profile option."""
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.dataSource.register(DeltaShareDataSource)
    prof = _v2_profile(tmp_path, oauth_server)
    df = (
        spark.read.format("deltashare")
        .option("profile", str(prof))
        .load("sales.web.clicks")
    )
    rows = {(r.id, r.pcol) for r in df.collect()}
    assert rows == {(1, "eu"), (2, "eu"), (3, "eu"), (10, "us"), (11, "us"), (12, "us")}
