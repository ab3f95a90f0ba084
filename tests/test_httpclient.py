"""HTTP poll source: poll → NDJSON staging files → Spark reads them.
Runs against a local stdlib http.server (no network)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from electrician_spark.streaming.httpclient import HttpPoller, OAuth2ClientCredentials


class _Handler(BaseHTTPRequestHandler):
    fail_next = 0
    token_calls = 0

    def log_message(self, *a):  # silence
        pass

    def _send(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if _Handler.fail_next > 0:
            _Handler.fail_next -= 1
            self._send({"error": "boom"}, code=500)
            return
        if self.path == "/feedback":
            self._send(
                [
                    {"customerId": 1, "content": "great delivery", "auth": self.headers.get("Authorization")},
                    {"customerId": 2, "content": "bad support"},
                ]
            )
        else:
            self._send({"single": True})

    def do_POST(self):
        if self.path == "/token":
            _Handler.token_calls += 1
            self._send({"access_token": f"tok-{_Handler.token_calls}", "expires_in": 3600})
        else:
            self._send({}, code=404)


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_poll_lands_ndjson_and_spark_reads_it(spark, server, tmp_path):
    staging = str(tmp_path / "staging")
    poller = HttpPoller(url=f"{server}/feedback", staging_dir=staging)
    n = poller.run(interval_s=0.01, max_polls=3)
    assert n == 3
    df = spark.read.json(staging)  # 3 polls × 2 records
    assert df.count() == 6
    assert df.filter(df.content.contains("delivery")).count() == 3


def test_single_object_becomes_one_line(server, tmp_path):
    poller = HttpPoller(url=f"{server}/single", staging_dir=str(tmp_path))
    path = poller.poll_once()
    lines = open(path).read().splitlines()
    assert lines == ['{"single": true}']


def test_retry_with_backoff_recovers(server, tmp_path):
    _Handler.fail_next = 2
    poller = HttpPoller(
        url=f"{server}/feedback", staging_dir=str(tmp_path), max_retries=3, backoff_s=0.01
    )
    poller.poll_once()  # two 500s then success


def test_retries_exhausted_raises(server, tmp_path):
    _Handler.fail_next = 5
    poller = HttpPoller(
        url=f"{server}/feedback", staging_dir=str(tmp_path), max_retries=1, backoff_s=0.01
    )
    with pytest.raises(Exception):
        poller.poll_once()
    _Handler.fail_next = 0


def test_oauth_token_cached_and_sent(server, tmp_path):
    _Handler.token_calls = 0
    oauth = OAuth2ClientCredentials(
        token_url=f"{server}/token", client_id="cid", client_secret="sec", scopes=("read",)
    )
    poller = HttpPoller(url=f"{server}/feedback", staging_dir=str(tmp_path), oauth=oauth)
    p1 = poller.poll_once()
    poller.poll_once()
    assert _Handler.token_calls == 1  # cached across polls
    first = json.loads(open(p1).read().splitlines()[0])
    assert first["auth"] == "Bearer tok-1"
