"""Delta Sharing connection profile.

Mirrors the reference's config surface (`/root/reference/src/
delta_sharing_client.cpp:21-61`): endpoint + bearer token (required, with
env-var defaults DELTA_SHARING_ENDPOINT / DELTA_SHARING_BEARER_TOKEN),
optional credentials version and expiration time, trailing-slash strip.
Additionally accepts the standard Delta Sharing ``profile.json`` file
format used by the open-source connectors — both ``shareCredentialsVersion``
1 (static bearer token) and 2 (``type: oauth_client_credentials`` with a
token endpoint + client id/secret; see ``client/oauth.py``). The reference
is bearer-only, so v2 is a strict superset.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path

ENV_ENDPOINT = "DELTA_SHARING_ENDPOINT"
ENV_BEARER_TOKEN = "DELTA_SHARING_BEARER_TOKEN"


@dataclass(frozen=True)
class DeltaSharingProfile:
    endpoint: str
    bearer_token: str = ""
    share_credentials_version: int = 1
    expiration_time: str = ""
    # shareCredentialsVersion 2, type oauth_client_credentials
    token_endpoint: str = ""
    client_id: str = ""
    client_secret: str = ""
    scope: str = ""

    @property
    def uses_oauth(self) -> bool:
        return bool(self.token_endpoint)

    def __post_init__(self) -> None:
        if not self.endpoint:
            raise ValueError("delta sharing endpoint is required")
        if self.token_endpoint:
            if not self.client_id or not self.client_secret:
                raise ValueError(
                    "oauth_client_credentials profiles require clientId "
                    "and clientSecret alongside tokenEndpoint"
                )
        elif not self.bearer_token:
            raise ValueError("delta sharing bearer token is required")
        # trailing-slash strip, as the reference does (client.cpp:37-40)
        object.__setattr__(self, "endpoint", self.endpoint.rstrip("/"))

    @classmethod
    def from_env(cls) -> "DeltaSharingProfile":
        return cls(
            endpoint=os.environ.get(ENV_ENDPOINT, ""),
            bearer_token=os.environ.get(ENV_BEARER_TOKEN, ""),
        )

    @classmethod
    def from_file(cls, path: str | Path) -> "DeltaSharingProfile":
        """Load a standard Delta Sharing profile file. Version 1:
        {"shareCredentialsVersion": 1, "endpoint": ..., "bearerToken": ...,
         "expirationTime": ...}. Version 2 discriminates on "type":
        "oauth_client_credentials" carries tokenEndpoint/clientId/
        clientSecret (+ optional scope); "bearer_token" carries the v1
        bearerToken fields."""
        obj = json.loads(Path(path).read_text())
        ver = int(obj.get("shareCredentialsVersion", 1))
        if ver == 1:
            return cls(
                endpoint=obj.get("endpoint", ""),
                bearer_token=obj.get("bearerToken", ""),
                share_credentials_version=1,
                expiration_time=obj.get("expirationTime", "") or "",
            )
        if ver == 2:
            typ = obj.get("type", "")
            if typ == "oauth_client_credentials":
                return cls(
                    endpoint=obj.get("endpoint", ""),
                    share_credentials_version=2,
                    token_endpoint=obj.get("tokenEndpoint", ""),
                    client_id=obj.get("clientId", ""),
                    client_secret=obj.get("clientSecret", ""),
                    scope=obj.get("scope", "") or "",
                )
            if typ == "bearer_token":
                return cls(
                    endpoint=obj.get("endpoint", ""),
                    bearer_token=obj.get("bearerToken", ""),
                    share_credentials_version=2,
                    expiration_time=obj.get("expirationTime", "") or "",
                )
            # gate on the type explicitly: an unknown credential type
            # must not fall through to a token-missing error that sends
            # the user hunting for the wrong thing
            raise ValueError(
                f"unsupported shareCredentialsVersion 2 type {typ!r}: this "
                "client implements 'bearer_token' and "
                "'oauth_client_credentials'"
            )
        raise ValueError(
            f"unsupported shareCredentialsVersion {ver}: this client "
            "implements versions 1 (bearer token) and 2 (bearer token or "
            "OAuth client credentials)"
        )
