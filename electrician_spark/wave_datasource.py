"""Native Spark data source for the wave binary format (Python Data
Source API, Spark 4) — the "optional custom DSv2" SURVEY §7.3 defers:
`spark.read.format("wave")` over a directory of `.wave` files.

Format (reference codec/wave.go:14-151 capability, same layout as
functions/codecs.wave_encode): little-endian u32 sample count, then n
f64 re values, then n f64 im values.

Scale posture: one InputPartition per file — Spark schedules files
across executors like binaryFile, but the scan yields decoded
(path, n_samples, re, im) rows directly (no intermediate blob column,
no second decode stage). The Python DataSource API (Spark 4) does not
push column pruning down to ``read()``; pass ``.option("metaOnly",
"true")`` to skip decoding the sample arrays (header-only read —
NULL arrays, real n_samples) when a query needs only counts/paths.
Unlike binaryFile, ``partitions()``/``read()`` use ``glob``/``open``,
so the source reads DRIVER/EXECUTOR-VISIBLE LOCAL FILESYSTEMS only
(local disk, NFS, FUSE mounts) — object stores need the binaryFile +
codec-decode path in functions/codecs instead. Malformed files yield
a NULL-array row (the codec's error contract), never a task failure.

Register per session:  spark.dataSource.register(WaveDataSource)
Then:                  spark.read.format("wave").load("/path/dir")
"""

from __future__ import annotations

import glob
import os
import struct

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WAVE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("n_samples", IntegerType(), True),
        StructField("re", ArrayType(DoubleType()), True),
        StructField("im", ArrayType(DoubleType()), True),
    ]
)


class _WaveFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class WaveReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.root = options.get("path")
        if not self.root:
            raise ValueError("wave source requires a path")
        self.pattern = options.get("glob", "*.wave")
        # metaOnly: header-only scan (path + n_samples, NULL arrays) —
        # the manual pruning knob, since the Python DataSource API has
        # no column-pruning pushdown into read().
        self.meta_only = str(options.get("metaOnly", "false")).lower() == "true"

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.root, self.pattern)))
        # one partition per file: the same split granularity binaryFile
        # uses; empty dirs yield a single empty partition so the scan
        # is a valid zero-row relation rather than an error
        return [_WaveFilePartition(f) for f in files] or [_WaveFilePartition("")]

    def read(self, partition):
        if not partition.path:
            return
        try:
            with open(partition.path, "rb") as fh:
                b = fh.read(4 if self.meta_only else -1)
            if len(b) < 4:
                raise ValueError("truncated header")
            (n,) = struct.unpack_from("<I", b, 0)
            if self.meta_only:
                # header-only contract: size check against the file
                # stat, arrays stay NULL, body bytes never read
                if os.path.getsize(partition.path) < 4 + 16 * n:
                    raise ValueError("truncated body")
                yield (partition.path, n, None, None)
                return
            if len(b) < 4 + 16 * n:
                raise ValueError("truncated body")
            doubles = struct.unpack_from(f"<{2 * n}d", b, 4)
            yield (partition.path, n, list(doubles[:n]), list(doubles[n:]))
        except Exception:  # noqa: BLE001 — malformed file → NULL row
            yield (partition.path, None, None, None)


class WaveDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wave"

    def schema(self):
        return WAVE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WaveReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(WaveDataSource)
