"""OAuth 2.0 client-credentials token management for
``shareCredentialsVersion: 2`` Delta Sharing profiles.

Public protocol surface (delta-sharing PROTOCOL.md, profile file format
v2, type ``oauth_client_credentials``): the profile carries a
``tokenEndpoint`` + ``clientId`` / ``clientSecret`` instead of a static
bearer token; the client exchanges them at the token endpoint with the
standard RFC 6749 §4.4 client-credentials grant
(``grant_type=client_credentials`` form body) and sends the returned
``access_token`` as the bearer. The reference client is bearer-only
(`/root/reference/src/delta_sharing_client.cpp:21-61`), so this is a
strict superset, not a parity item.

Refresh discipline:
- tokens are cached until ``expires_in`` minus a leeway (60 s, or half
  the lifetime for very short tokens) and re-fetched lazily;
- a 401 from the data/control plane invalidates the cached token so the
  request retry fetches a fresh one — covering server-side revocation
  and clock skew;
- fetches are serialized under a lock (streams hit the client from
  multiple threads) and the token state is keyed so concurrent
  invalidations of an ALREADY-replaced token are no-ops.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request


class OAuthError(Exception):
    """Token-endpoint failure (terminal after retries)."""


class OAuthClientCredentials:
    def __init__(
        self,
        token_endpoint: str,
        client_id: str,
        client_secret: str,
        scope: str = "",
        timeout_sec: float = 30.0,
        max_retries: int = 2,
        leeway_sec: float = 60.0,
        clock=time.monotonic,
    ):
        if not token_endpoint or not client_id or not client_secret:
            raise ValueError(
                "oauth_client_credentials profiles require tokenEndpoint, "
                "clientId and clientSecret"
            )
        self.token_endpoint = token_endpoint
        self.client_id = client_id
        self.client_secret = client_secret
        self.scope = scope
        self.timeout_sec = timeout_sec
        self.max_retries = max_retries
        self.leeway_sec = leeway_sec
        self._clock = clock
        self._lock = threading.Lock()
        self._token: str | None = None
        self._expires_at: float = 0.0
        self.fetch_count = 0  # observability + test hook

    # -- public -------------------------------------------------------------

    def token(self) -> str:
        """A currently-valid access token (cached or freshly fetched)."""
        with self._lock:
            now = self._clock()
            if self._token is not None and now < self._expires_at:
                return self._token
            tok, expires_in = self._fetch()
            self._token = tok
            # leeway: refresh before the server-side expiry so in-flight
            # requests never race the boundary; very short tokens keep at
            # least half their lifetime usable
            leeway = min(self.leeway_sec, expires_in / 2.0)
            self._expires_at = now + max(expires_in - leeway, 0.0)
            self.fetch_count += 1
            return tok

    def invalidate(self, token: str | None = None) -> None:
        """Drop the cached token (after a 401). Passing the rejected token
        makes the drop conditional: if another thread already replaced it,
        the fresh token survives."""
        with self._lock:
            if token is None or token == self._token:
                self._token = None
                self._expires_at = 0.0

    # -- transport ----------------------------------------------------------

    def _fetch(self) -> tuple[str, float]:
        form = {
            "grant_type": "client_credentials",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
        }
        if self.scope:
            form["scope"] = self.scope
        data = urllib.parse.urlencode(form).encode()
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            req = urllib.request.Request(
                self.token_endpoint,
                data=data,
                headers={"Content-Type": "application/x-www-form-urlencoded"},
                method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                    obj = json.loads(resp.read().decode())
            except urllib.error.HTTPError as e:
                raw = e.read().decode(errors="replace")
                last_err = OAuthError(
                    f"token endpoint {self.token_endpoint} answered "
                    f"{e.code}: {raw[:500]}"
                )
                if e.code in (429, 500, 502, 503, 504) and attempt < self.max_retries:
                    time.sleep(min(2**attempt * 0.2, 2.0))
                    continue
                raise last_err from None
            except (OSError, ValueError) as e:
                last_err = OAuthError(
                    f"token endpoint {self.token_endpoint} unreachable or "
                    f"unparsable: {e}"
                )
                if attempt < self.max_retries:
                    time.sleep(min(2**attempt * 0.2, 2.0))
                    continue
                raise last_err from None
            tok = obj.get("access_token")
            if not tok:
                raise OAuthError(
                    f"token endpoint {self.token_endpoint} returned no "
                    f"access_token: {json.dumps(obj)[:500]}"
                )
            ttype = str(obj.get("token_type", "Bearer"))
            if ttype.lower() != "bearer":
                raise OAuthError(
                    f"unsupported token_type {ttype!r} (only Bearer tokens "
                    "can back the Authorization header this client sends)"
                )
            try:
                expires_in = float(obj.get("expires_in", 3600.0))
            except (TypeError, ValueError):
                expires_in = 3600.0
            return str(tok), expires_in
        raise last_err  # pragma: no cover
