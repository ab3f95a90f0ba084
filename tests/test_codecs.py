"""Codec round-trip tests — mirrors the reference codec suite
(codec/codec_test.go:19-249: JSON, line, text, binary, XML, HTML, wave,
truncated-wave error)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electrician_spark.functions import codecs as cx


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "hello", 2.5), (2, "wörld", -1.0)], "id int, s string, v double"
    )


def test_json_round_trip(df):
    enc = df.select("id", cx.json_encode("id", "s", "v").alias("js"))
    dec = enc.select(
        "id", cx.json_decode(F.col("js"), "id int, s string, v double").alias("o")
    ).select("id", "o.s", "o.v")
    got = {r.id: (r.s, r.v) for r in dec.collect()}
    assert got == {1: ("hello", 2.5), 2: ("wörld", -1.0)}


def test_xml_round_trip(df):
    enc = df.select("id", cx.xml_encode("id", "s", row_tag="rec").alias("x"))
    assert "<rec>" in enc.collect()[0].x
    dec = enc.select("id", cx.xml_decode(F.col("x"), "id int, s string", row_tag="rec").alias("o"))
    got = {r.id: r.o.s for r in dec.collect()}
    assert got == {1: "hello", 2: "wörld"}


def test_html_encode(df):
    r = df.select(cx.html_encode(F.col("s")).alias("h")).collect()[0]
    assert r.h == "<li>hello</li>"


def test_line_round_trip(df):
    enc = df.select(cx.line_encode("id", "s", "v").alias("line"))
    dec = enc.select(*cx.line_decode(F.col("line"), ["id", "s", "v"]))
    got = {r.id: (r.s, r.v) for r in dec.collect()}
    assert got == {"1": ("hello", "2.5"), "2": ("wörld", "-1.0")}


def test_binary_and_base64_round_trip(df):
    enc = df.select("id", cx.binary_encode(F.col("s")).alias("b"))
    assert dict(enc.dtypes)["b"] == "binary"
    dec = enc.select("id", cx.binary_decode(F.col("b")).alias("s"))
    assert {r.id: r.s for r in dec.collect()} == {1: "hello", 2: "wörld"}
    b64 = enc.select("id", cx.from_base64(cx.to_base64(F.col("b"))).alias("b2"))
    assert {r.id: bytes(r.b2) for r in b64.collect()} == {
        1: "hello".encode(),
        2: "wörld".encode(),
    }


def test_aes_round_trip(df):
    key = "0123456789abcdef"  # 16-byte AES-128
    enc = df.select("id", cx.aes_encrypt(F.col("s"), key).alias("c"))
    dec = enc.select("id", cx.aes_decrypt(F.col("c"), key).cast("string").alias("s"))
    assert {r.id: r.s for r in dec.collect()} == {1: "hello", 2: "wörld"}


def test_wave_binary_round_trip(spark):
    waves = spark.createDataFrame(
        [(1, [1.0, -2.0, 3.5], [0.0, 0.5, -0.5]), (2, [], [])],
        "id int, re array<double>, im array<double>",
    )
    enc = waves.select("id", cx.wave_encode("re", "im").alias("blob"))
    dec = enc.select("id", cx.wave_decode("blob").alias("w")).select("id", "w.re", "w.im")
    got = {r.id: (r.re, r.im) for r in dec.collect()}
    assert got[1] == ([1.0, -2.0, 3.5], [0.0, 0.5, -0.5])
    assert got[2] == ([], [])


def test_wave_truncated_decodes_to_null(spark):
    """Reference codec_test truncated-wave error case → NULL column,
    not a task failure."""
    import struct

    bad = struct.pack("<I", 100) + b"\x00" * 8  # claims 100 samples, has 1
    blobs = spark.createDataFrame([(1, bytearray(bad)), (2, bytearray(b"\x01"))], "id int, blob binary")
    dec = blobs.select("id", cx.wave_decode("blob").alias("w"))
    rows = {r.id: r.w for r in dec.collect()}
    assert rows[1].re is None and rows[2].re is None
