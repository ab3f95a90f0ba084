"""S7 WebSocket client source: RFC 6455 codec round-trips plus an
end-to-end drain from a local stdlib socket server into NDJSON staging
consumed by Spark (reference: adapter/websocketclient serve/dial)."""

import json
import socket
import threading

from electrician_spark.streaming.websocketclient import (
    OP_BINARY,
    OP_CLOSE,
    OP_CONT,
    OP_PING,
    OP_TEXT,
    WebSocketClient,
    WebSocketPoller,
    accept_key,
    decode_frames,
    encode_frame,
)


def test_frame_codec_round_trip_masked_and_sizes():
    for payload in (b"", b"x", b"a" * 125, b"b" * 126, b"c" * 70000):
        raw = encode_frame(payload, OP_BINARY, mask=b"\x01\x02\x03\x04")
        frames, rest = decode_frames(raw)
        assert rest == b""
        assert frames == [(True, OP_BINARY, payload)]


def test_decode_partial_frames_returns_remainder():
    raw = encode_frame(b"hello", OP_TEXT) + encode_frame(b"world", OP_TEXT)
    frames, rest = decode_frames(raw[:7])  # first frame complete at 7 bytes
    assert frames == [(True, OP_TEXT, b"hello")]
    frames2, rest2 = decode_frames(rest + raw[7:])
    assert frames2 == [(True, OP_TEXT, b"world")]
    assert rest2 == b""


def test_accept_key_rfc_example():
    # The worked example from RFC 6455 §1.3.
    assert accept_key("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def _serve_once(server: socket.socket, frames: list[bytes]) -> None:
    conn, _ = server.accept()
    req = b""
    while b"\r\n\r\n" not in req:
        req += conn.recv(4096)
    key = next(
        line.split(b": ", 1)[1].decode()
        for line in req.split(b"\r\n")
        if line.lower().startswith(b"sec-websocket-key")
    )
    conn.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
        ).encode()
    )
    for fr in frames:
        conn.sendall(fr)
    conn.recv(4096)  # client close echo
    conn.close()


def test_websocket_drain_to_staging_and_spark_read(spark, tmp_path):
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    frames = [
        encode_frame(json.dumps({"user": "a", "n": 1}).encode(), OP_TEXT),
        # fragmented message: TEXT fin=0 + CONT fin=1 (reassembly path)
        encode_frame(b'{"user": "b", ', OP_TEXT, fin=False),
        encode_frame(b'"n": 2}', OP_CONT, fin=True),
        encode_frame(b"keepalive", OP_PING),  # must be answered, not yielded
        encode_frame(json.dumps({"user": "c", "n": 3}).encode(), OP_TEXT),
        encode_frame(b"", OP_CLOSE),
    ]
    t = threading.Thread(target=_serve_once, args=(server, frames), daemon=True)
    t.start()

    client = WebSocketClient("127.0.0.1", port)
    client.connect()
    poller = WebSocketPoller(client, staging_dir=str(tmp_path / "staging"))
    path = poller.drain(max_messages=10)  # close frame ends the drain early
    client.close()
    t.join(timeout=5)
    server.close()

    df = spark.read.json(path)
    rows = {r.user: r.n for r in df.collect()}
    assert rows == {"a": 1, "b": 2, "c": 3}
