"""Multimodal plumbing tests: binary columns flow through mapInPandas
feature extraction with real schema/batching; decode itself is stubbed
(no codec libs in the container — SURVEY build mandate)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from electrician_spark import multimodal as mm
from electrician_spark.io import read_table
from tests.conftest import SF_SMOKE


def test_attach_binary_schema(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = mm.attach_binary(docs, "text")
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() == docs.count()


def test_extract_features_matches_local_hash(spark):
    docs = read_table(spark, SF_SMOKE, "documents").limit(20)
    media = mm.attach_binary(docs, "text")
    feats = mm.extract_features(media).collect()
    assert len(feats) == 20
    texts = {r.text.encode("utf-8") for r in docs.collect()}
    hashes = {hashlib.sha256(t).hexdigest() for t in texts}
    for r in feats:
        assert r.ok == "ok"
        assert r.sha256 in hashes
        assert r.n_bytes > 0
        assert 64 <= r.width < 256 and 64 <= r.height < 256  # stub bounds


def test_extract_features_error_column_not_task_failure(spark):
    media = spark.createDataFrame(
        [(1, "image", "application/octet-stream", None, "s://x")],
        mm.MEDIA_SCHEMA,
    )
    r = mm.extract_features(media).collect()[0]
    assert r.ok.startswith("error:")
    assert r.n_bytes == 0 and r.sha256 is None


def test_frame_sample_plan_explodes(spark):
    docs = read_table(spark, SF_SMOKE, "documents").limit(5)
    media = mm.attach_binary(docs, "text", modality="video")
    frames = mm.frame_sample_plan(media, every_n=1)
    per_media = frames.groupBy("media_id").count().collect()
    assert len(per_media) == 5
    assert all(r["count"] >= 1 for r in per_media)


def test_size_partitions_spreads(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = mm.attach_binary(docs, "text")
    spread = mm.size_partitions(media, n_buckets=8)
    assert spread.rdd.getNumPartitions() == 8
    assert spread.count() == media.count()


def test_resize_plan_dims_and_determinism(spark):
    from electrician_spark import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "small doc"), (2, "x" * 500), (3, "another payload")],
        "doc_id long, text string",
    )
    media = mm.attach_binary(docs, "text", id_col="doc_id")
    out = mm.resize_plan(media, max_side=128).collect()
    assert {r.media_id for r in out} == {1, 2, 3}
    for r in out:
        assert r.ok == "ok"
        # aspect-preserving: longest side clamps to max_side, never upscaled
        assert 1 <= r.target_w <= 128 and 1 <= r.target_h <= 128
        assert len(r.resized) == max(1, r.target_w * r.target_h // 64)
    # deterministic across runs (stub is hash-derived, no RNG)
    again = mm.resize_plan(media, max_side=128).collect()
    assert sorted((r.media_id, bytes(r.resized)) for r in out) == sorted(
        (r.media_id, bytes(r.resized)) for r in again
    )
