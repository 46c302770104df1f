"""Delta Sharing connection profile.

Mirrors the reference's config surface (`/root/reference/src/
delta_sharing_client.cpp:21-61`): endpoint + bearer token (required, with
env-var defaults DELTA_SHARING_ENDPOINT / DELTA_SHARING_BEARER_TOKEN),
optional credentials version and expiration time, trailing-slash strip.
Additionally accepts the standard Delta Sharing ``profile.json`` file
format used by the open-source connectors.
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
    bearer_token: str
    share_credentials_version: int = 1
    expiration_time: str = ""

    def __post_init__(self) -> None:
        if not self.endpoint:
            raise ValueError("delta sharing endpoint is required")
        if not self.bearer_token:
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
        """Load a standard Delta Sharing profile file:
        {"shareCredentialsVersion": 1, "endpoint": ..., "bearerToken": ...,
         "expirationTime": ...}"""
        obj = json.loads(Path(path).read_text())
        ver = int(obj.get("shareCredentialsVersion", 1))
        if ver > 1:
            # gate on the version FIRST (standard-connector behavior): a
            # v2 OAuth profile has no bearerToken, and the token-missing
            # error would send the user hunting for the wrong thing
            raise ValueError(
                f"unsupported shareCredentialsVersion {ver}: this client "
                "implements version 1 (bearer-token profiles)"
            )
        return cls(
            endpoint=obj.get("endpoint", ""),
            bearer_token=obj.get("bearerToken", ""),
            share_credentials_version=int(obj.get("shareCredentialsVersion", 1)),
            expiration_time=obj.get("expirationTime", "") or "",
        )
