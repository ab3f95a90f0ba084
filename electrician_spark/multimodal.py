"""Multimodal columns — image/audio/video as opaque binary + typed
metadata (LLM-pipeline extension).

Design: media travels as a ``binary`` column with a metadata struct
(modality, mime, width/height/duration, source uri). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each partition processes a bounded batch of
blobs without ever collecting to the driver.

The container has no image/audio codecs, so the actual byte→pixels
decode is STUBBED (deterministic fake or NotImplementedError, clearly
marked). Everything around it — schema, batch shape, partition sizing,
UDF signatures — is real and tested; swapping in PIL/ffmpeg is a
one-function change on the executor side.

Scale notes: blobs dominate partition bytes — size partitions by
``spark.sql.files.maxPartitionBytes`` (or repartition by byte budget
via ``size_partitions``) so a 100 TB media table doesn't produce 2 GB
Arrow batches; ``spark.sql.execution.arrow.maxRecordsPerBatch`` caps
the batch row count.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("source_uri", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("ok", StringType()),
    ]
)


def attach_binary(
    df: DataFrame, text_col: str, modality: str = "image", id_col: str | None = None
) -> DataFrame:
    """Build a media frame from any table for plumbing tests: payload =
    utf-8 bytes of a text column. Real pipelines read binary files via
    ``spark.read.format('binaryFile')`` — same downstream plan.
    ``id_col`` keeps a stable key; the default synthesizes one."""
    return df.select(
        (F.col(id_col) if id_col else F.monotonically_increasing_id()).alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "utf-8").cast("binary").alias("payload"),
        F.lit("synthetic://fixture").alias("source_uri"),
    )


def _decode_stub(payload: bytes, mime: str) -> tuple[int, int]:
    """STUB decode: derive deterministic fake (width, height) from the
    payload hash. Replace with PIL.Image.open for real images — the
    surrounding plumbing (batching, schema, error column) is unchanged.
    Raises for modalities the stub doesn't model, exercising the error
    path the way a corrupt blob would."""
    if payload is None:
        raise ValueError("empty payload")
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: byte stats +
    stubbed decode, failures captured in the ``ok`` column (DLQ column
    pattern, reliability.py) instead of failing the task."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payload = b["payload"]
            # Column-wise byte stats (Series.map over the blob column —
            # no per-row DataFrame materialization); only the decode
            # stub itself runs per row, since a real codec would too.
            out = pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "modality": b["modality"],
                    "n_bytes": payload.map(lambda p: len(p) if p is not None else 0).astype(
                        "int64"
                    ),
                    "sha256": payload.map(
                        lambda p: hashlib.sha256(p).hexdigest() if p is not None else None
                    ),
                }
            )
            widths: list[int | None] = []
            heights: list[int | None] = []
            oks: list[str] = []
            for p, mime in zip(payload, b["mime"]):
                try:
                    w, h = _decode_stub(p, mime)
                    widths.append(w)
                    heights.append(h)
                    oks.append("ok")
                except Exception as exc:  # noqa: BLE001 — error → column, not task failure
                    widths.append(None)
                    heights.append(None)
                    oks.append(f"error: {exc}")
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["ok"] = oks
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a (stubbed) frame index
    list per video, keyed for downstream image processing. Real decode
    would emit actual frames; the partitioning/explode shape is what
    matters at scale (one video → many frame rows, so repartition after
    explode to rebalance)."""
    n_frames = (F.length(F.col("payload")) / 100).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        F.sha2(F.concat(F.col("payload"), F.lit(":frame:")), 256).alias("frame_key"),
    ).repartition("media_id")


def size_partitions(df: DataFrame, n_buckets: int = 1024) -> DataFrame:
    """Spread blobs across ``n_buckets`` hash partitions keyed on
    media_id — deterministic, shuffle-friendly balancing so no single
    partition accumulates outsized payloads. (A cumulative-bytes
    running sum would balance perfectly but needs a global order —
    not viable at 100 TB; hash spreading is the scale answer, with
    ``files.maxPartitionBytes`` bounding the read side.)"""
    return df.repartition(n_buckets, F.crc32(F.col("media_id").cast("string")))


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("resized", BinaryType()),
        StructField("ok", StringType()),
    ]
)


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image-resize plumbing: aspect-preserving target dims computed
    from the (stub-decoded) source dims, then a mapInPandas stage that
    would hold the pixel work. The STUB emits a deterministic
    sha256-derived byte payload sized ~(w*h/64) in place of real
    pixels (clearly marked; swap `_resize_stub` for PIL's
    Image.resize on a real deployment). Target-dim math, batch shape,
    output schema, and error channeling (`ok`) are real and tested."""

    def _resize_stub(payload: bytes, tw: int, th: int) -> bytes:
        seed = hashlib.sha256(payload + f":{tw}x{th}".encode()).digest()
        need = max(1, tw * th // 64)
        return (seed * (need // len(seed) + 1))[:need]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, tws, ths, blobs, oks = [], [], [], [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                try:
                    w, h = _decode_stub(bytes(payload), "image/unknown")
                    scale = max_side / max(w, h)
                    tw = max(1, round(w * min(scale, 1.0)))
                    th = max(1, round(h * min(scale, 1.0)))
                    blobs.append(_resize_stub(bytes(payload), tw, th))
                    tws.append(tw)
                    ths.append(th)
                    oks.append("ok")
                except Exception as ex:  # noqa: BLE001 — per-row error channel
                    tws.append(0)
                    ths.append(0)
                    blobs.append(b"")
                    oks.append(f"err:{type(ex).__name__}")
                ids.append(mid)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "target_w": pd.array(tws, dtype="int32"),
                    "target_h": pd.array(ths, dtype="int32"),
                    "resized": blobs,
                    "ok": oks,
                }
            )

    return df.select("media_id", "payload").mapInPandas(gen, RESIZED_SCHEMA)
