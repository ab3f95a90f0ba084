"""WARC data source: record parsing (plain + multi-member gzip),
type filtering at the scan, metaOnly census reads, the torn-file
error row, and the end-to-end crawl chain WARC → HTTP split → HTML
main-content extraction."""

import gzip

from pyspark.sql import functions as F

from electrician_spark import warc_datasource as wd

HTML = (b"<html><head><title>T</title></head><body>"
        b"<nav><a href='/'>Home</a></nav>"
        b"<p>The quick brown fox jumps over the lazy dog of the fixture.</p>"
        b"</body></html>")
HTTP = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: " + str(len(HTML)).encode() + b"\r\n\r\n" + HTML)


def _record(wtype: str, uri: str | None, payload: bytes, rid: str) -> bytes:
    h = [b"WARC/1.0",
         b"WARC-Type: " + wtype.encode(),
         b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
         b"WARC-Date: 2026-08-15T00:00:00Z",
         b"Content-Type: application/http; msgtype=response"
         if wtype == "response" else b"Content-Type: application/warc-fields"]
    if uri:
        h.append(b"WARC-Target-URI: " + uri.encode())
    h.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _write_archives(tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    info = _record("warcinfo", None, b"software: test\r\n", "i1")
    req = _record("request", "http://a.example/x", b"GET /x HTTP/1.1\r\n\r\n", "r1")
    resp = _record("response", "http://a.example/x", HTTP, "p1")
    (d / "a.warc").write_bytes(info + req + resp)
    # gzip: one member per record, concatenated (the Common Crawl layout)
    resp2 = _record("response", "http://b.example/y", HTTP, "p2")
    gz = gzip.compress(info) + gzip.compress(resp2)
    (d / "b.warc.gz").write_bytes(gz)
    (d / "torn.warc").write_bytes(info + b"WARC/1.0\r\nWARC-Type: response\r\n"
                                  b"Content-Length: 999999\r\n\r\nshort")
    return str(d)


def test_warc_scan_records_and_types(spark, tmp_path):
    root = _write_archives(tmp_path)
    wd.register(spark)
    df = spark.read.format("warc").load(root)
    rows = df.collect()
    by_id = {r.record_id: r for r in rows if r.record_id}
    assert by_id["<urn:uuid:p1>"].warc_type == "response"
    assert by_id["<urn:uuid:p1>"].target_uri == "http://a.example/x"
    assert bytes(by_id["<urn:uuid:p1>"].payload) == HTTP
    assert by_id["<urn:uuid:p2>"].content_length == len(HTTP)  # gzip member path
    assert by_id["<urn:uuid:r1>"].warc_type == "request"
    # torn.warc: the valid leading record is kept AND the error row appears
    torn = [r for r in rows if r.path.endswith("torn.warc")]
    assert any(r.record_id == "<urn:uuid:i1>" for r in torn)
    assert any(r.record_id is None and r.warc_type is None for r in torn)

    only_resp = (
        spark.read.format("warc").option("types", "response").load(root).collect()
    )
    assert {r.warc_type for r in only_resp if r.warc_type} == {"response"}
    assert len([r for r in only_resp if r.record_id]) == 2

    meta = (
        spark.read.format("warc").option("metaOnly", "true")
        .option("types", "response").load(root).collect()
    )
    for r in meta:
        if r.record_id:
            assert r.payload is None and r.content_length == len(HTTP)


def test_warc_to_main_text_chain(spark, tmp_path):
    """The full crawl-curation entry: WARC scan → HTTP split → HTML
    main-content extraction. The nav chrome dies, the prose lives."""
    root = _write_archives(tmp_path)
    wd.register(spark)
    resp = spark.read.format("warc").option("types", "response").load(root)
    split = wd.split_http_response(resp)
    ok = split.filter(F.col("http_status") == 200)
    assert ok.count() == 2
    from electrician_spark.functions import html as H

    docs = ok.withColumn("html", F.col("body").cast("string"))
    out = H.extract_main_text(docs)
    for r in out.collect():
        assert "quick brown fox" in r.text
        assert "Home" not in r.text
        assert r.n_good_blocks == 1


def test_split_http_response_error_channel(spark):
    df = spark.createDataFrame(
        [(1, b"not http at all"), (2, None)], "id long, payload binary"
    )
    out = {r.id: r for r in wd.split_http_response(df).collect()}
    assert out[1].http_status is None and out[1].body is None
    assert out[2].http_status is None


def test_empty_dir_is_valid_relation(spark, tmp_path):
    wd.register(spark)
    d = tmp_path / "none"
    d.mkdir()
    assert spark.read.format("warc").load(str(d)).count() == 0
