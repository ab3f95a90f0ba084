"""Protobuf wire codec for the relay envelope (WrappedPayload).

The reference ships envelopes between relays as protobuf —
``WrappedPayload`` (/root/reference/proto/electrician_relay.proto:16-43):
id(1), timestamp(2, google.protobuf.Timestamp), payload(3) bytes,
metadata(4, MessageMetadata), seq(6) uint64, payload_type(8),
ordering_key(22), expires_at(23, Timestamp), dedupe_key(25). The
engine's envelope is ordinary COLUMNS (envelope.py); this module
closes the wire-format asymmetry: serialize an envelope row to the
exact proto3 byte layout (for shipping over a byte transport — a
Kafka value, a staging blob) and parse it back.

Pure Python, fixed schema: proto3's wire format is just varints +
length-delimited fields, so encode/decode is ~100 lines of stdlib —
no protoc codegen, no spark-protobuf jar, no pip dependency. The
Spark surface is a pair of Arrow-batched pandas UDFs (bytes in/out;
the sanctioned Python path — byte-twiddling has no Column-expression
form), with timestamps crossing the UDF boundary as epoch-micros
LONGs (``unix_micros``/``timestamp_micros`` on the column side) so
the codec is session-timezone-proof.

Field mapping notes:
- timestamp/expires_at encode as google.protobuf.Timestamp
  sub-messages (seconds=1 varint, nanos=2 varint) at microsecond
  input precision (nanos = micros%1e6 * 1000).
- compression/encryption markers ride in metadata.headers (map entry
  = repeated nested {key=1, value=2} — the real proto3 map layout)
  rather than PerformanceOptions enums: the engine supports more
  codecs (gzip, bz2, xz, ...) than the reference's
  CompressionAlgorithm enum, and headers round-trip exactly.
- payload_type(8) carries the record encoding name ('json') —
  PayloadEncoding(7) only enumerates GOB/PROTO.
- proto3 default omission: empty/NULL fields are absent from the
  wire; the decoder restores NULLs (and 'none' markers).
- the decoder skips unknown fields by wire type, so envelopes from a
  richer writer (delivery mode, transport hints, fragments) parse.

Scale: both UDFs are Arrow-batched and stateless — one corpus scan,
no shuffle, linear in payload bytes; identical posture to the
compression/AES codecs in functions/codecs.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# WrappedPayload field numbers (electrician_relay.proto:16-43)
_F_ID = 1
_F_TIMESTAMP = 2
_F_PAYLOAD = 3
_F_METADATA = 4
_F_SEQ = 6
_F_PAYLOAD_TYPE = 8
_F_ORDERING_KEY = 22
_F_EXPIRES_AT = 23
_F_DEDUPE_KEY = 25
# MessageMetadata.headers (electrician_relay.proto:55)
_F_MD_HEADERS = 1
# map entry layout (proto3 spec: repeated message {key=1; value=2})
_F_MAP_KEY = 1
_F_MAP_VALUE = 2
# google.protobuf.Timestamp
_F_TS_SECONDS = 1
_F_TS_NANOS = 2

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5


def _varint(n: int) -> bytes:
    """Unsigned LEB128 — negative ints (proto3 int64) are 2^64-offset."""
    if n < 0:
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if i >= len(buf):
            raise ValueError(
                f"truncated WrappedPayload: varint runs past the buffer "
                f"end at byte {i}"
            )
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")


def _take(buf: bytes, i: int, n: int) -> tuple[bytes, int]:
    """Slice n bytes with an explicit truncation check: a cut-off
    buffer (e.g. a partial Kafka value) must raise a codec error, not
    silently yield a short payload for downstream delivery."""
    if n < 0 or i + n > len(buf):
        raise ValueError(
            f"truncated WrappedPayload: field declares {n} bytes at "
            f"offset {i} but only {len(buf) - i} remain"
        )
    return buf[i : i + n], i + n


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, data: bytes) -> bytes:
    return _tag(field, _WIRE_LEN) + _varint(len(data)) + data


def _ts_message(epoch_us: int) -> bytes:
    secs, us = divmod(epoch_us, 1_000_000)
    out = _tag(_F_TS_SECONDS, _WIRE_VARINT) + _varint(secs)
    if us:
        out += _tag(_F_TS_NANOS, _WIRE_VARINT) + _varint(us * 1000)
    return out


def _parse_ts(buf: bytes) -> int:
    secs = nanos = 0
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        val, i = _read_varint(buf, i)
        if field == _F_TS_SECONDS:
            secs = val
        elif field == _F_TS_NANOS:
            nanos = val
        elif wire != _WIRE_VARINT:  # pragma: no cover — malformed
            raise ValueError("unexpected field in Timestamp")
    if secs >= 1 << 63:
        secs -= 1 << 64
    return secs * 1_000_000 + nanos // 1000


def encode_wrapped(
    *,
    id: str,
    ts_us: int | None,
    payload: bytes,
    seq: int,
    encoding: str = "json",
    compression: str = "none",
    encryption: str = "none",
    ordering_key: str | None = None,
    dedupe_key: str | None = None,
    expires_us: int | None = None,
) -> bytes:
    """One envelope → WrappedPayload bytes (proto3 canonical-ish:
    fields in number order, defaults omitted)."""
    out = bytearray()
    if id:
        out += _len_field(_F_ID, id.encode("utf-8"))
    if ts_us is not None:
        out += _len_field(_F_TIMESTAMP, _ts_message(ts_us))
    if payload:
        out += _len_field(_F_PAYLOAD, payload)
    headers = []
    if compression and compression != "none":
        headers.append(("compression", compression))
    if encryption and encryption != "none":
        headers.append(("encryption", encryption))
    if headers:
        md = bytearray()
        for k, v in headers:
            entry = _len_field(_F_MAP_KEY, k.encode("utf-8")) + _len_field(
                _F_MAP_VALUE, v.encode("utf-8")
            )
            md += _len_field(_F_MD_HEADERS, entry)
        out += _len_field(_F_METADATA, bytes(md))
    if seq:
        out += _tag(_F_SEQ, _WIRE_VARINT) + _varint(seq)
    if encoding and encoding != "none":
        out += _len_field(_F_PAYLOAD_TYPE, encoding.encode("utf-8"))
    if ordering_key is not None:
        out += _len_field(_F_ORDERING_KEY, ordering_key.encode("utf-8"))
    if expires_us is not None:
        out += _len_field(_F_EXPIRES_AT, _ts_message(expires_us))
    if dedupe_key is not None:
        out += _len_field(_F_DEDUPE_KEY, dedupe_key.encode("utf-8"))
    return bytes(out)


def _skip(buf: bytes, i: int, wire: int) -> int:
    if wire == _WIRE_VARINT:
        _, i = _read_varint(buf, i)
    elif wire == _WIRE_I64:
        _, i = _take(buf, i, 8)
    elif wire == _WIRE_LEN:
        n, i = _read_varint(buf, i)
        _, i = _take(buf, i, n)
    elif wire == _WIRE_I32:
        _, i = _take(buf, i, 4)
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return i


def _parse_headers(buf: bytes) -> dict[str, str]:
    """MessageMetadata — only headers(1) are consumed; every other
    metadata field (version, performance, security, routing, ...)
    is skipped by wire type."""
    out: dict[str, str] = {}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if field == _F_MD_HEADERS and wire == _WIRE_LEN:
            n, i = _read_varint(buf, i)
            entry, i = _take(buf, i, n)
            j = 0
            k = v = ""
            while j < len(entry):
                ekey, j = _read_varint(entry, j)
                ef, ew = ekey >> 3, ekey & 7
                if ew != _WIRE_LEN:
                    j = _skip(entry, j, ew)
                    continue
                ln, j = _read_varint(entry, j)
                # _take, not a bare slice: a corrupt inner length would
                # silently yield a truncated header value (compression
                # 'gzi') that surfaces later as an opaque decompress
                # failure — raise at decode time like every other path
                sb, j = _take(entry, j, ln)
                s = sb.decode("utf-8")
                if ef == _F_MAP_KEY:
                    k = s
                elif ef == _F_MAP_VALUE:
                    v = s
            out[k] = v
        else:
            i = _skip(buf, i, wire)
    return out


def decode_wrapped(buf: bytes) -> dict:
    """WrappedPayload bytes → envelope dict (proto3 defaults where
    absent; unknown fields skipped by wire type)."""
    d: dict = {
        "id": "",
        "ts_us": None,
        "payload": b"",
        "seq": 0,
        "encoding": "none",
        "compression": "none",
        "encryption": "none",
        "ordering_key": None,
        "dedupe_key": None,
        "expires_us": None,
    }
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == _WIRE_LEN:
            n, i = _read_varint(buf, i)
            data, i = _take(buf, i, n)
            if field == _F_ID:
                d["id"] = data.decode("utf-8")
            elif field == _F_TIMESTAMP:
                d["ts_us"] = _parse_ts(data)
            elif field == _F_PAYLOAD:
                d["payload"] = data
            elif field == _F_METADATA:
                h = _parse_headers(data)
                d["compression"] = h.get("compression", "none")
                d["encryption"] = h.get("encryption", "none")
            elif field == _F_PAYLOAD_TYPE:
                d["encoding"] = data.decode("utf-8")
            elif field == _F_ORDERING_KEY:
                d["ordering_key"] = data.decode("utf-8")
            elif field == _F_EXPIRES_AT:
                d["expires_us"] = _parse_ts(data)
            elif field == _F_DEDUPE_KEY:
                d["dedupe_key"] = data.decode("utf-8")
            # else: unknown length-delimited field — already consumed
        elif wire == _WIRE_VARINT:
            val, i = _read_varint(buf, i)
            if field == _F_SEQ:
                if val >= 1 << 63:
                    # proto allows uint64 but the engine's seq column is
                    # int64 (Arrow LongType): raise a codec-level error
                    # here instead of letting the pandas-UDF Arrow
                    # conversion kill the whole query opaquely.
                    raise ValueError(
                        f"WrappedPayload.seq {val} exceeds the engine's "
                        f"int64 seq domain (2^63-1)"
                    )
                d["seq"] = val
            # else: unknown varint field — already consumed
        else:
            i = _skip(buf, i, wire)
    return d


_DECODED_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("ts_us", LongType()),
        StructField("payload", BinaryType()),
        StructField("seq", LongType()),
        StructField("encoding", StringType()),
        StructField("compression", StringType()),
        StructField("encryption", StringType()),
        StructField("ordering_key", StringType()),
        StructField("dedupe_key", StringType()),
        StructField("expires_us", LongType()),
    ]
)


def wire_encode(df: DataFrame, out_col: str = "wire") -> DataFrame:
    """Envelope rows (envelope.ENVELOPE_COLS) → ``out_col`` binary
    WrappedPayload. Timestamps are read as unix_micros column-side
    (timezone-proof); all envelope columns are preserved."""
    import pandas as pd

    @F.pandas_udf(BinaryType())
    def _enc(id_s, ts_s, payload_s, seq_s, enc_s, comp_s, encr_s, okey_s, dkey_s, exp_s):
        return pd.Series(
            [
                encode_wrapped(
                    id=i or "",
                    ts_us=None if pd.isna(t) else int(t),
                    payload=b"" if p is None else bytes(p),
                    seq=0 if pd.isna(q) else int(q),
                    encoding=e or "none",
                    compression=c or "none",
                    encryption=r or "none",
                    ordering_key=o,
                    dedupe_key=k,
                    expires_us=None if pd.isna(x) else int(x),
                )
                for i, t, p, q, e, c, r, o, k, x in zip(
                    id_s, ts_s, payload_s, seq_s, enc_s, comp_s, encr_s,
                    okey_s, dkey_s, exp_s,
                )
            ]
        )

    return df.withColumn(
        out_col,
        _enc(
            F.col("id"),
            F.unix_micros(F.col("ts")),
            F.col("payload"),
            F.col("seq"),
            F.col("encoding"),
            F.col("compression"),
            F.col("encryption"),
            F.col("ordering_key"),
            F.col("dedupe_key"),
            F.unix_micros(F.col("expires_at")),
        ),
    )


def wire_decode(
    df: DataFrame, col: str = "wire", keep: tuple[str, ...] = ()
) -> DataFrame:
    """``col`` binary WrappedPayload → the keep columns (in the order
    given) followed by the envelope columns (envelope.ENVELOPE_COLS
    order), replacing whatever else was in ``df`` — a receiving relay
    reconstructs the envelope from bytes alone. ``keep`` names extra
    input columns to carry through
    (e.g. a transport offset or a precomputed wire length); a keep
    name that collides with an envelope output column (or the internal
    ``_d`` alias) would silently duplicate a column name in the output
    schema, so it raises instead (the same guard langid_scores applies
    to its carry columns)."""
    import pandas as pd

    from electrician_spark.envelope import ENVELOPE_COLS

    bad = [k for k in keep if k in ENVELOPE_COLS or k == "_d"]
    if bad:
        raise ValueError(
            f"keep columns collide with envelope output columns: {bad} — "
            f"rename them upstream (output schema is keep + ENVELOPE_COLS)"
        )

    @F.pandas_udf(_DECODED_SCHEMA)
    def _dec(s):
        return pd.DataFrame(
            [decode_wrapped(b"" if b is None else bytes(b)) for b in s],
            columns=[f.name for f in _DECODED_SCHEMA.fields],
        )

    d = F.col("_d")
    return (
        df.withColumn("_d", _dec(F.col(col)))
        .select(
            *[F.col(k) for k in keep],
            d["id"].alias("id"),
            F.timestamp_micros(d["ts_us"]).alias("ts"),
            d["payload"].alias("payload"),
            d["seq"].alias("seq"),
            d["encoding"].alias("encoding"),
            d["compression"].alias("compression"),
            d["encryption"].alias("encryption"),
            d["ordering_key"].alias("ordering_key"),
            d["dedupe_key"].alias("dedupe_key"),
            F.timestamp_micros(d["expires_us"]).alias("expires_at"),
        )
    )
