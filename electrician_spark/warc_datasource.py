"""Native Spark data source for WARC web-archive files (Python Data
Source API, Spark 4): `spark.read.format("warc")` over a directory of
`.warc` / `.warc.gz` files — the container format web-crawl corpora
(Common Crawl) actually arrive in, making the repo's crawl-curation
chain (HTML main-content extraction → C4 battery → dedup family)
runnable from the raw archives.

Format (ISO 28500 / WARC 1.0, public spec): records of
``WARC/1.x CRLF`` + CRLF-terminated named headers + blank line +
``Content-Length`` payload bytes + CRLF CRLF. Gzipped archives are
per-record gzip members concatenated into one file; Python's gzip
reader consumes concatenated members natively, so both layouts stream
through the same parser.

Scale posture: one InputPartition per file (the binaryFile split
granularity — archives are written in ~1 GB shards precisely so file
parallelism is the unit of scale); records stream through a bounded
buffer, never a whole-file read. ``.option("types", "response")``
filters record types AT THE SCAN (the dominant reader wants responses
only — requests/metadata never leave the source), and
``.option("metaOnly", "true")`` skips payload materialization (header
census scans). Like the wave source, ``partitions()``/``read()`` use
``glob``/``open``: driver/executor-visible filesystems only; object
stores need a binaryFile + codec path. A malformed file yields one
NULL-fields row for the path (the repo-wide error-channel contract) —
records already parsed are kept, a torn tail never fails the task.

Register per session:  spark.dataSource.register(WarcDataSource)
Then:                  spark.read.format("warc").load("/path/dir")
"""

from __future__ import annotations

import glob
import gzip
import io
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("record_id", StringType(), True),
        StructField("warc_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("content_length", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

_MAX_HEADER_BYTES = 64 * 1024  # a sane WARC header block is << this


def iter_warc_records(fh):
    """Yield (headers: dict[str.lower, str], payload: bytes) per record
    from a binary file-like positioned at a record boundary. Raises
    ValueError on structural corruption (bad magic, unterminated
    header block, short payload)."""
    while True:
        line = fh.readline(_MAX_HEADER_BYTES)
        while line in (b"\r\n", b"\n"):  # tolerate inter-record padding
            line = fh.readline(_MAX_HEADER_BYTES)
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC magic: {line[:20]!r}")
        headers: dict[str, str] = {}
        n_hdr = 0
        while True:
            h = fh.readline(_MAX_HEADER_BYTES)
            n_hdr += len(h)
            if n_hdr > _MAX_HEADER_BYTES:
                raise ValueError("unterminated WARC header block")
            if h in (b"\r\n", b"\n"):
                break
            if not h:
                raise ValueError("EOF inside WARC header block")
            k, _, v = h.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("missing/bad Content-Length") from exc
        payload = fh.read(length)
        if len(payload) != length:
            raise ValueError("short WARC payload")
        yield headers, payload


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.root = options.get("path")
        if not self.root:
            raise ValueError("warc source requires a path")
        self.pattern = options.get("glob", "*.warc*")
        types = options.get("types", "")
        self.types = {t.strip().lower() for t in types.split(",") if t.strip()}
        self.meta_only = str(options.get("metaOnly", "false")).lower() == "true"

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.root, self.pattern)))
        return [_WarcFilePartition(f) for f in files] or [_WarcFilePartition("")]

    def read(self, partition):
        if not partition.path:
            return
        try:
            raw = open(partition.path, "rb")
            fh = (
                io.BufferedReader(gzip.GzipFile(fileobj=raw))
                if partition.path.endswith(".gz")
                else raw
            )
            with raw:
                for headers, payload in iter_warc_records(fh):
                    wtype = headers.get("warc-type", "").lower()
                    if self.types and wtype not in self.types:
                        continue
                    yield (
                        partition.path,
                        headers.get("warc-record-id"),
                        wtype,
                        headers.get("warc-target-uri"),
                        headers.get("warc-date"),
                        headers.get("content-type"),
                        len(payload),
                        None if self.meta_only else payload,
                    )
        except Exception:  # noqa: BLE001 — torn/corrupt file → error row
            yield (partition.path, None, None, None, None, None, None, None)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WarcReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(WarcDataSource)


def split_http_response(df, payload_col: str = "payload"):
    """Split ``application/http; msgtype=response`` payloads into
    (http_status int, http_headers string, body binary) columns —
    mapInPandas (Arrow-batched) because bodies are arbitrary binary
    (images/PDFs), not text. Non-HTTP payloads land in the standard
    error-channel columns (status NULL, body NULL)."""
    import pandas as pd

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("http_status", IntegerType(), True),
            StructField("http_headers", StringType(), True),
            StructField("body", BinaryType(), True),
        ]
    )

    def gen(batches):
        for b in batches:
            st, hd, bod = [], [], []
            for p in b[payload_col]:
                try:
                    raw = bytes(p)
                    head, _, body = raw.partition(b"\r\n\r\n")
                    first = head.split(b"\r\n", 1)[0]
                    if not first.startswith(b"HTTP/"):
                        raise ValueError("not an HTTP response payload")
                    st.append(int(first.split()[1]))
                    hd.append(head.decode("utf-8", "replace"))
                    bod.append(body)
                except Exception:  # noqa: BLE001 — per-row error channel
                    st.append(None)
                    hd.append(None)
                    bod.append(None)
            out = b.copy()
            out["http_status"] = pd.array(st, dtype="Int32")
            out["http_headers"] = hd
            out["body"] = bod
            yield out

    return df.mapInPandas(gen, out_schema)
