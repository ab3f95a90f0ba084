"""HTTP poll source — the reference's httpclient adapter, Spark-shaped.

The reference polls a REST endpoint on an interval with retry/backoff
and optional OAuth2 client-credentials, decoding JSON into pipeline
records (/root/reference/pkg/internal/adapter/httpclient/serve.go:13-67,
pkg/builder/httpclient_adapter.go:14-71). Spark has no HTTP source, and
SURVEY §2.1/S3 deliberately keeps the ingestion edge out of the engine:
a thin driver-side poller lands each poll as an NDJSON staging file,
and the engine consumes the staging directory with the file stream
source (``streaming.sources.file_stream``) — giving checkpointed,
replayable ingestion instead of an unreplayable socket.

Everything here is driver-side and single-threaded by design: the
poller is an ingestion *edge*, not a data-plane operator. Scale comes
from many pollers landing into one staging prefix, never from
parallelizing one poll.

Only stdlib (urllib) is used; tests run against a local http.server.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field


@dataclass
class OAuth2ClientCredentials:
    """Client-credentials grant (httpclient_adapter.go WithOAuth2...).
    Fetches and caches a bearer token, refreshing ``early_s`` before
    expiry."""

    token_url: str
    client_id: str
    client_secret: str
    scopes: tuple[str, ...] = ()
    early_s: int = 30
    _token: str | None = field(default=None, repr=False)
    _expires_at: float = field(default=0.0, repr=False)

    def token(self, now: float | None = None) -> str:
        now = time.time() if now is None else now
        if self._token is None or now >= self._expires_at - self.early_s:
            body = urllib.parse.urlencode(
                {
                    "grant_type": "client_credentials",
                    "client_id": self.client_id,
                    "client_secret": self.client_secret,
                    **({"scope": " ".join(self.scopes)} if self.scopes else {}),
                }
            ).encode()
            req = urllib.request.Request(self.token_url, data=body, method="POST")
            with urllib.request.urlopen(req) as resp:  # noqa: S310 — caller-supplied URL
                payload = json.loads(resp.read())
            self._token = payload["access_token"]
            self._expires_at = now + float(payload.get("expires_in", 3600))
        return self._token


@dataclass
class HttpPoller:
    """Poll ``url`` and land each successful poll as one NDJSON staging
    file: ``{staging_dir}/poll-{index:08d}.ndjson``.

    Response handling: a JSON array becomes one line per element; a
    JSON object becomes a single line — the reference's decode-into-T
    with slice support (codec/json.go:25-50). Retries use capped
    exponential backoff (serve.go retry loop)."""

    url: str
    staging_dir: str
    method: str = "GET"
    body: bytes | None = None
    headers: dict[str, str] = field(default_factory=dict)
    max_retries: int = 3
    backoff_s: float = 0.2
    backoff_cap_s: float = 5.0
    oauth: OAuth2ClientCredentials | None = None
    _n: int = 0

    def _request(self) -> bytes:
        headers = dict(self.headers)
        if self.oauth is not None:
            headers["Authorization"] = f"Bearer {self.oauth.token()}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                req = urllib.request.Request(
                    self.url, data=self.body, headers=headers, method=self.method
                )
                with urllib.request.urlopen(req) as resp:  # noqa: S310
                    return resp.read()
            except (urllib.error.URLError, OSError) as e:  # retry w/ backoff
                last_err = e
                if attempt < self.max_retries:
                    time.sleep(min(self.backoff_s * (2**attempt), self.backoff_cap_s))
        raise last_err  # type: ignore[misc]

    def poll_once(self) -> str:
        """One poll → one staging file; returns the file path."""
        raw = self._request()
        decoded = json.loads(raw)
        records = decoded if isinstance(decoded, list) else [decoded]
        os.makedirs(self.staging_dir, exist_ok=True)
        path = os.path.join(self.staging_dir, f"poll-{self._n:08d}.ndjson")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for rec in records:
                f.write(json.dumps(rec, sort_keys=True) + "\n")
        os.rename(tmp, path)  # atomic visibility for the file-stream lister
        self._n += 1
        return path

    def run(self, interval_s: float, max_polls: int | None = None) -> int:
        """Poll on an interval (serve.go WithInterval). Returns the
        number of polls completed. Bounded runs (``max_polls``) are the
        finite-batch mode; unbounded is the streaming edge."""
        done = 0
        while max_polls is None or done < max_polls:
            self.poll_once()
            done += 1
            if max_polls is None or done < max_polls:
                time.sleep(interval_s)
        return done
