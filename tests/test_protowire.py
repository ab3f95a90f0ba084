"""Protobuf WrappedPayload wire codec (functions/protowire.py —
reference wire format, proto/electrician_relay.proto:16-43).

Layers: pure-Python encode/decode (golden byte vector, round trips,
unknown-field skipping, hypothesis property), and the Spark surface
(envelope.to_wire/from_wire: byte-only reconstruction, cross-codec
equality with the JSON wire form, compression+encryption markers)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from electrician_spark import envelope
from electrician_spark.functions.protowire import (
    decode_wrapped,
    encode_wrapped,
)


def test_golden_wire_vector():
    """Byte-exact layout, hand-derived from the proto3 wire spec:
    tags (field<<3|wire), LEB128 varints, length-delimited strings,
    nested Timestamp and map-entry messages."""
    b = encode_wrapped(
        id="ab",
        ts_us=1_000_000,
        payload=b"hi",
        seq=3,
        encoding="json",
        compression="gzip",
        encryption="none",
        ordering_key="k",
        dedupe_key=None,
        expires_us=None,
    )
    expected = (
        "0a026162"  # id(1): "ab"
        "12020801"  # timestamp(2): Timestamp{seconds(1)=1}
        "1a026869"  # payload(3): b"hi"
        "2215"  # metadata(4), 21 bytes
        "0a13"  # .headers(1) map entry, 19 bytes
        "0a0b" + "compression".encode().hex()  # entry.key(1)
        + "1204" + "gzip".encode().hex()  # entry.value(2)
        + "3003"  # seq(6)=3
        "4204" + "json".encode().hex()  # payload_type(8)
        + "b20101" + "k".encode().hex()  # ordering_key(22)
    )
    assert b.hex() == expected
    assert decode_wrapped(b) == {
        "id": "ab",
        "ts_us": 1_000_000,
        "payload": b"hi",
        "seq": 3,
        "encoding": "json",
        "compression": "gzip",
        "encryption": "none",
        "ordering_key": "k",
        "dedupe_key": None,
        "expires_us": None,
    }


def test_unknown_fields_are_skipped():
    """A richer writer's fields (channel(21) string, delivery(20)
    varint, fragment(28) message) must parse transparently."""
    base = encode_wrapped(
        id="x", ts_us=None, payload=b"p", seq=1, ordering_key=None
    )
    extra = (
        base
        + bytes.fromhex("aa01")  # channel(21), wire 2
        + bytes([4]) + b"chan"
        + bytes.fromhex("a001") + bytes([1])  # delivery(20), varint
        + bytes.fromhex("e201") + bytes([2]) + bytes.fromhex("0801")  # fragment(28)
    )
    assert decode_wrapped(extra) == decode_wrapped(base)


def test_micros_ride_timestamp_nanos():
    d = decode_wrapped(
        encode_wrapped(id="", ts_us=1_705_320_000_000_123, payload=b"", seq=0)
    )
    assert d["ts_us"] == 1_705_320_000_000_123


@settings(max_examples=200, deadline=None)
@given(
    id_=st.text(max_size=40),
    ts=st.none() | st.integers(min_value=0, max_value=4_102_444_800_000_000),
    payload=st.binary(max_size=300),
    seq=st.integers(min_value=0, max_value=(1 << 63) - 1),
    enc=st.sampled_from(["json", "none", "proto"]),
    comp=st.sampled_from(["none", "gzip", "zstd", "deflate", "bz2"]),
    encr=st.sampled_from(["none", "aes-gcm"]),
    okey=st.none() | st.text(max_size=40),
    dkey=st.none() | st.text(max_size=40),
    exp=st.none() | st.integers(min_value=0, max_value=4_102_444_800_000_000),
)
def test_roundtrip_property(id_, ts, payload, seq, enc, comp, encr, okey, dkey, exp):
    d = decode_wrapped(
        encode_wrapped(
            id=id_,
            ts_us=ts,
            payload=payload,
            seq=seq,
            encoding=enc,
            compression=comp,
            encryption=encr,
            ordering_key=okey,
            dedupe_key=dkey,
            expires_us=exp,
        )
    )
    # proto3 default omission folds empty → default on decode
    assert d["id"] == id_
    assert d["ts_us"] == ts
    assert d["payload"] == payload
    assert d["seq"] == seq
    assert d["encoding"] == (enc if enc != "none" else "none")
    assert d["compression"] == comp
    assert d["encryption"] == encr
    assert d["ordering_key"] == okey
    assert d["dedupe_key"] == dkey
    assert d["expires_us"] == exp


def _sample_envelopes(spark):
    rows = spark.createDataFrame(
        [(1, "alpha", "g1"), (2, "beta", "g1"), (3, "γάμμα", "g2")],
        "rec_id long, body string, grp string",
    )
    return envelope.wrap(
        rows,
        ["rec_id", "body"],
        ordering_key=F.col("grp"),
        dedupe_key=F.concat_ws(":", "grp", "rec_id"),
        ts=F.lit("2024-03-01 00:00:00").cast("timestamp"),
        ttl_seconds=60,
    )


def test_spark_wire_roundtrip_bytes_only(spark):
    """from_wire must rebuild the ENTIRE envelope from the binary
    column alone — every ENVELOPE_COLS value equal to the input."""
    env = _sample_envelopes(spark)
    w = envelope.to_wire(env, "proto").select("wire")
    back = envelope.from_wire(w, "proto")
    a = sorted(env.select(*envelope.ENVELOPE_COLS).collect())
    b = sorted(back.select(*envelope.ENVELOPE_COLS).collect())
    assert a == b


def test_spark_cross_codec_equality(spark):
    """proto wire and json wire must reconstruct identical envelopes."""
    env = _sample_envelopes(spark)
    p = envelope.from_wire(envelope.to_wire(env, "proto").select("wire"), "proto")
    j = envelope.from_wire(envelope.to_wire(env, "json").select("wire"), "json")
    assert sorted(p.collect()) == sorted(j.collect())


def test_spark_wire_preserves_codec_markers_and_payload(spark):
    """Compressed+encrypted envelopes: the markers ride metadata
    headers; unwrap after the wire round trip recovers the records."""
    rows = spark.createDataFrame([(10, "x"), (11, "y")], "rec_id long, body string")
    env = envelope.wrap(rows, compression="gzip", encryption_key="k" * 16)
    back = envelope.from_wire(envelope.to_wire(env, "proto").select("wire"), "proto")
    assert {
        (r["compression"], r["encryption"]) for r in back.collect()
    } == {("gzip", "aes-gcm")}
    out = envelope.unwrap(
        back, "rec_id long, body string", compression="gzip", encryption_key="k" * 16
    )
    got = {(r["_decoded"]["rec_id"], r["_decoded"]["body"]) for r in out.collect()}
    assert got == {(10, "x"), (11, "y")}


def test_unknown_wire_codec_raises(spark):
    env = _sample_envelopes(spark)
    with pytest.raises(ValueError, match="wire codec"):
        envelope.to_wire(env, "avro")
    with pytest.raises(ValueError, match="wire codec"):
        envelope.from_wire(env, "avro")


def test_truncated_buffers_raise_codec_errors():
    """A cut-off buffer (partial Kafka value) must raise a ValueError,
    never return a silently truncated envelope for delivery."""
    full = encode_wrapped(
        id="abcdef", ts_us=1_000_000, payload=b"payload-bytes", seq=7,
        ordering_key="k",
    )
    # cutting at EVERY prefix length must either raise ValueError or
    # (at field boundaries) decode to a consistent prefix — never
    # return a SHORTENED payload/id/key
    for cut in range(len(full)):
        try:
            d = decode_wrapped(full[:cut])
        except ValueError:
            continue
        for k in ("id", "payload", "ordering_key"):
            v = d[k]
            ref = {"id": "abcdef", "payload": b"payload-bytes",
                   "ordering_key": "k"}[k]
            assert v in (None, "", b"", ref), (cut, k, v)


def test_uint64_seq_above_int63_raises_codec_error():
    """proto allows uint64 seq; the engine's seq column is int64 —
    the decoder must fail with a codec-level error, not let the Arrow
    conversion kill the query opaquely."""
    from electrician_spark.functions.protowire import _tag, _varint

    buf = _tag(6, 0) + _varint((1 << 63) + 5)
    with pytest.raises(ValueError, match="int64 seq domain"):
        decode_wrapped(buf)


def test_corrupt_header_map_entry_length_raises():
    """A map-entry inner length pointing past the entry must raise at
    decode time (r12 advice: the header path used a bare slice and
    silently yielded truncated values like compression 'gzi')."""
    from electrician_spark.functions.protowire import _tag, _varint

    # metadata(4) -> headers(1) map entry whose VALUE length overruns
    entry = (
        _tag(1, 2) + _varint(11) + b"compression"
        + _tag(2, 2) + _varint(99) + b"gzip"  # claims 99, has 4
    )
    md = _tag(1, 2) + _varint(len(entry)) + entry
    buf = (
        _tag(1, 2) + _varint(2) + b"ab"
        + _tag(4, 2) + _varint(len(md)) + md
    )
    with pytest.raises(ValueError):
        decode_wrapped(buf)


def test_wire_keep_collision_raises(spark):
    env = _sample_envelopes(spark)
    for codec in ("proto", "json"):
        w = envelope.to_wire(env, codec)  # keeps env cols incl. "id"
        with pytest.raises(ValueError, match="collide"):
            envelope.from_wire(w, codec, keep=("id",))


def test_json_from_wire_honors_keep(spark):
    """r12 advice: the json branch accepted keep but silently dropped
    the columns — it must carry them like the proto branch."""
    env = _sample_envelopes(spark)
    w = envelope.to_wire(env, "json").withColumn("offset", F.col("seq") * 10)
    back = envelope.from_wire(w.select("wire", "offset"), "json", keep=("offset",))
    assert "offset" in back.columns
    rows = back.select("seq", "offset").collect()
    assert all(r.offset == r.seq * 10 for r in rows)
