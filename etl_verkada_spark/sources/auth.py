"""Auth pre-steps for the REST sources (SURVEY.md §2.1 S6/S7).

The reference performs two credential acquisitions before any scan:

* S6 — OAuth-style token exchange (task.ts:97-106): ``POST {base}/token``
  with the long-lived API key in an ``x-api-key`` header; the response
  body carries the short-lived bearer ``{token}`` every subsequent call
  sends as ``x-verkada-auth``.
* S7 — scoped streaming credential (task.ts:129-141):
  ``GET {base}/cameras/v1/footage/token`` with the API key; the response
  is a JWT plus the ACL lists (``accessibleCameras`` /
  ``accessibleSites``) that gate which devices may stream.

Both are DRIVER-SIDE pre-steps, exactly as in the reference: they run
once per job, before the cluster scan starts, and their outputs become
*parameters* of the dataflow — the bearer token is forwarded to every
executor fetch via the sources' ``auth_token`` option, and the ACL
lists become the broadcast build side of the streamability gate
(``pipeline.features.acl_flag``). Neither is itself distributed work:
a token exchange is one HTTPS round trip, and an ACL list that fits a
JSON response body fits a broadcast.
"""

from __future__ import annotations

import json
import urllib.request
from dataclasses import dataclass


def exchange_token(base_url: str, api_key: str, timeout: int = 30) -> str:
    """S6: swap the long-lived API key for a short-lived bearer token.

    ``POST {base_url}/token`` with ``x-api-key: <api_key>`` -> the
    ``token`` field of the JSON response (task.ts:97-106). Feed the
    result to the ``auth_token`` option of ``paged_rest`` /
    ``cursor_rest`` (forwarded as the ``x-verkada-auth`` header).
    """
    req = urllib.request.Request(f"{base_url}/token", method="POST")
    req.add_header("x-api-key", api_key)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = json.load(resp)
    return str(body["token"])


@dataclass(frozen=True)
class StreamToken:
    """S7 scoped credential: JWT + the ACLs it grants (task.ts:133-141)."""

    jwt: str
    accessible_cameras: tuple[str, ...]
    accessible_sites: tuple[str, ...]
    expiration: int
    expires_at: int
    permission: tuple[str, ...]


def fetch_stream_token(
    base_url: str, api_key: str, timeout: int = 30
) -> StreamToken:
    """S7: fetch the footage JWT and its camera/site ACL lists.

    ``GET {base_url}/cameras/v1/footage/token`` with ``x-api-key``
    (task.ts:129-141).
    """
    req = urllib.request.Request(f"{base_url}/cameras/v1/footage/token")
    req.add_header("x-api-key", api_key)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = json.load(resp)
    return StreamToken(
        jwt=str(body["jwt"]),
        accessible_cameras=tuple(body["accessibleCameras"]),
        accessible_sites=tuple(body["accessibleSites"]),
        expiration=int(body["expiration"]),
        expires_at=int(body["expiresAt"]),
        permission=tuple(body.get("permission", ())),
    )


def acl_dataframe(spark, token: StreamToken):
    """Lift the S7 ACL lists into the (kind, acl_id) table shape that
    ``pipeline.features.acl_flag`` broadcasts — the point where the
    credential pre-step hands over to distributed dataflow."""
    rows = [("site", s) for s in token.accessible_sites] + [
        ("camera", c) for c in token.accessible_cameras
    ]
    return spark.createDataFrame(rows, "kind string, acl_id string")
