"""WebSocket client source — the reference's websocketclient adapter,
Spark-shaped (S7).

The reference dials ws/wss, decodes frames into pipeline records, and
submits them (/root/reference/pkg/internal/adapter/websocketclient/
dial.go, serve.go). As with the HTTP poll source, SURVEY §2.1 keeps the
socket edge out of the data plane: a driver-side client drains frames
into NDJSON staging files, and the engine consumes the staging
directory with the checkpointed file-stream source
(``streaming.sources.file_stream``) — replayable ingestion instead of
an unreplayable socket.

No third-party websocket library exists in this environment, so the
frame layer is a minimal RFC 6455 implementation over stdlib sockets:
client handshake (Sec-WebSocket-Key/-Accept), frame encode/decode with
masking, fragmentation reassembly, ping/pong, close. Text messages are
treated as JSON records (one staging line each) — the reference's
decode-frames-into-T.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import struct
from dataclasses import dataclass, field
from typing import Iterator

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(key: str) -> str:
    """Sec-WebSocket-Accept for a client Sec-WebSocket-Key (RFC 6455 §4.2.2)."""
    digest = hashlib.sha1((key + _GUID).encode("ascii")).digest()  # noqa: S324 — protocol-mandated
    return base64.b64encode(digest).decode("ascii")


def encode_frame(
    payload: bytes, opcode: int = OP_TEXT, fin: bool = True, mask: bytes | None = None
) -> bytes:
    """One WebSocket frame. Client→server frames MUST carry a 4-byte
    ``mask``; server→client frames must not (RFC 6455 §5.1)."""
    head = bytearray()
    head.append((0x80 if fin else 0) | (opcode & 0x0F))
    mask_bit = 0x80 if mask is not None else 0
    n = len(payload)
    if n <= 125:
        head.append(mask_bit | n)
    elif n <= 0xFFFF:
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if mask is not None:
        if len(mask) != 4:
            raise ValueError("mask must be exactly 4 bytes")
        head += mask
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


def decode_frames(buf: bytes) -> tuple[list[tuple[bool, int, bytes]], bytes]:
    """Parse all complete frames from ``buf``. Returns
    ``([(fin, opcode, unmasked_payload), ...], remainder)`` where
    remainder is the trailing bytes of a partial frame (feed it back in
    with more data appended)."""
    frames: list[tuple[bool, int, bytes]] = []
    i = 0
    while True:
        if len(buf) - i < 2:
            break
        b0, b1 = buf[i], buf[i + 1]
        fin, opcode = bool(b0 & 0x80), b0 & 0x0F
        masked, ln = bool(b1 & 0x80), b1 & 0x7F
        pos = i + 2
        if ln == 126:
            if len(buf) - pos < 2:
                break
            ln = struct.unpack(">H", buf[pos : pos + 2])[0]
            pos += 2
        elif ln == 127:
            if len(buf) - pos < 8:
                break
            ln = struct.unpack(">Q", buf[pos : pos + 8])[0]
            pos += 8
        mask = b""
        if masked:
            if len(buf) - pos < 4:
                break
            mask = buf[pos : pos + 4]
            pos += 4
        if len(buf) - pos < ln:
            break
        payload = buf[pos : pos + ln]
        if masked:
            payload = bytes(b ^ mask[j % 4] for j, b in enumerate(payload))
        frames.append((fin, opcode, payload))
        i = pos + ln
    return frames, buf[i:]


@dataclass
class WebSocketClient:
    """Dial a ws:// endpoint and iterate complete messages
    (fragmentation reassembled, pings answered, close honored).
    TLS (wss://) would wrap the socket with ``ssl.SSLContext`` — the
    reference's TLS config maps there; plain ws is what the local tests
    exercise."""

    host: str
    port: int
    path: str = "/"
    headers: dict[str, str] = field(default_factory=dict)
    timeout_s: float = 10.0
    _sock: socket.socket | None = field(default=None, repr=False)

    def connect(self) -> None:
        key = base64.b64encode(os.urandom(16)).decode("ascii")
        sock = socket.create_connection((self.host, self.port), timeout=self.timeout_s)
        lines = [
            f"GET {self.path} HTTP/1.1",
            f"Host: {self.host}:{self.port}",
            "Upgrade: websocket",
            "Connection: Upgrade",
            f"Sec-WebSocket-Key: {key}",
            "Sec-WebSocket-Version: 13",
        ]
        lines += [f"{k}: {v}" for k, v in self.headers.items()]
        sock.sendall(("\r\n".join(lines) + "\r\n\r\n").encode("ascii"))
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                raise ConnectionError("server closed during websocket handshake")
            resp += chunk
        head, _, rest = resp.partition(b"\r\n\r\n")
        status = head.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise ConnectionError(f"websocket upgrade refused: {status!r}")
        expected = accept_key(key).encode("ascii")
        if expected not in head:
            raise ConnectionError("Sec-WebSocket-Accept mismatch")
        self._sock = sock
        self._buf = rest

    def send_text(self, text: str) -> None:
        assert self._sock is not None, "connect() first"
        self._sock.sendall(encode_frame(text.encode("utf-8"), OP_TEXT, mask=os.urandom(4)))

    def messages(self, max_messages: int | None = None) -> Iterator[tuple[int, bytes]]:
        """Yield (opcode, payload) per complete message until close /
        EOF / ``max_messages``. Control frames are handled inline (ping
        → pong; close → echo close and stop), matching the reference's
        serve loop."""
        assert self._sock is not None, "connect() first"
        parts: list[bytes] = []
        first_op = OP_TEXT
        yielded = 0
        while max_messages is None or yielded < max_messages:
            frames, self._buf = decode_frames(self._buf)
            if not frames:
                chunk = self._sock.recv(4096)
                if not chunk:
                    return
                self._buf += chunk
                continue
            for fin, opcode, payload in frames:
                if opcode == OP_PING:
                    self._sock.sendall(encode_frame(payload, OP_PONG, mask=os.urandom(4)))
                    continue
                if opcode == OP_CLOSE:
                    self._sock.sendall(encode_frame(payload, OP_CLOSE, mask=os.urandom(4)))
                    return
                if opcode == OP_PONG:
                    continue
                if opcode in (OP_TEXT, OP_BINARY):
                    first_op = opcode
                parts.append(payload)
                if fin:
                    yield first_op, b"".join(parts)
                    parts = []
                    yielded += 1
                    if max_messages is not None and yielded >= max_messages:
                        return

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.sendall(encode_frame(b"", OP_CLOSE, mask=os.urandom(4)))
            except OSError:
                pass
            self._sock.close()
            self._sock = None


@dataclass
class WebSocketPoller:
    """Drain WebSocket text messages into NDJSON staging files for the
    file-stream source — one file per ``drain`` call, atomic rename for
    the stream lister (same contract as ``HttpPoller``)."""

    client: WebSocketClient
    staging_dir: str
    _n: int = 0

    def drain(self, max_messages: int) -> str:
        records = []
        for opcode, payload in self.client.messages(max_messages=max_messages):
            if opcode == OP_TEXT:
                records.append(json.loads(payload))
            else:  # binary frames stage as hex payloads (BinaryType downstream)
                records.append({"payload_hex": payload.hex()})
        os.makedirs(self.staging_dir, exist_ok=True)
        path = os.path.join(self.staging_dir, f"ws-{self._n:08d}.ndjson")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for rec in records:
                f.write(json.dumps(rec, sort_keys=True) + "\n")
        os.rename(tmp, path)
        self._n += 1
        return path
