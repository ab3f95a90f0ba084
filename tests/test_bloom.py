"""Portable Bloom filter (operators/bloom.py): bit-exact plain-Python
replay, no-false-negative guarantee, FP behavior, and equality of
bloom-prefiltered decontamination with the broadcast-exact operator."""

import hashlib

from pyspark.sql import functions as F

from electrician_spark.operators import bloom, dedup

M, K = 1 << 14, 4


def _py_bits(key: str) -> list[int]:
    return [
        int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:15], 16) % M
        for j in range(1, K + 1)
    ]


def _py_bloom(keys) -> dict[int, int]:
    words: dict[int, int] = {}
    for key in keys:
        for b in _py_bits(key):
            words[b // 63] = words.get(b // 63, 0) | (1 << (b % 63))
    return words


def test_build_matches_python_replay(spark):
    keys = [f"key-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r.word_idx: r.word
        for r in bloom.build_bloom(df, "k", m_bits=M, k=K).collect()
    }
    assert got == _py_bloom(keys)


def test_membership_no_false_negatives_and_fp_rate(spark):
    members = [f"member-{i}" for i in range(500)]
    flt = bloom.build_bloom(
        spark.createDataFrame([(k,) for k in members], "k string"), "k", M, K
    )
    probes = members + [f"absent-{i}" for i in range(2000)]
    out = {
        r.k: r.maybe_member
        for r in bloom.with_bloom_membership(
            spark.createDataFrame([(k,) for k in probes], "k string"),
            "k", flt, M, K,
        ).collect()
    }
    assert all(out[k] for k in members)  # NEVER a false negative
    fp = sum(out[k] for k in probes if k.startswith("absent-")) / 2000
    # 500 keys * 4 bits in 16384 bits -> theoretical FP ~ (1-e^-0.122)^4 ~ 2e-4
    assert fp < 0.02, fp


def test_probe_plan_is_broadcast_only(spark):
    flt = bloom.build_bloom(
        spark.createDataFrame([("a",)], "k string"), "k", M, K
    ).localCheckpoint()
    plan = (
        bloom.with_bloom_membership(
            spark.createDataFrame([("a",), ("b",)], "k string"), "k", flt, M, K
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_decontamination_equals_broadcast_exact(spark):
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    testset = corpus.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id", F.substring("text", 1, 120).alias("text")
    )
    a = {
        r.doc_id: (r.n_shingles, r.n_hits, round(r.containment, 9))
        for r in bloom.contamination_scores_bloom(
            corpus, testset, m_bits=M, k=K
        ).collect()
    }
    b = {
        r.doc_id: (r.n_shingles, r.n_hits, round(r.containment, 9))
        for r in dedup.contamination_scores(corpus, testset).collect()
    }
    assert a == b
    assert any(v[1] > 0 for v in a.values())  # planted hits actually exist


def test_decontamination_broadcast_guard_fallback_equal(spark):
    """max_broadcast_rows=0 forces the over-threshold path: the verify
    and hit joins run WITHOUT broadcast hints (shuffle joins — the
    multi-GB-candidate-set survival mode) and the result is identical
    to the broadcast path."""
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    testset = corpus.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id", F.substring("text", 1, 120).alias("text")
    )
    fast = {
        r.doc_id: (r.n_shingles, r.n_hits)
        for r in bloom.contamination_scores_bloom(
            corpus, testset, m_bits=M, k=K
        ).collect()
    }
    guarded = {
        r.doc_id: (r.n_shingles, r.n_hits)
        for r in bloom.contamination_scores_bloom(
            corpus, testset, m_bits=M, k=K, max_broadcast_rows=0
        ).collect()
    }
    assert fast == guarded


def test_probe_rejects_helper_column_collision(spark):
    # A caller column named like a probe helper (_bit, _w1, ...) would
    # be silently overwritten then dropped — must raise instead (r15
    # review finding).
    import pytest

    from electrician_spark.operators.bloom import build_bloom, with_bloom_membership

    keys = spark.createDataFrame([("k1",)], "key string")
    bloom = build_bloom(keys, "key", m_bits=1 << 10, k=2)
    probe = spark.createDataFrame([("k1", 1)], "key string, _bit int")
    with pytest.raises(ValueError, match="_bit"):
        with_bloom_membership(probe, "key", bloom, m_bits=1 << 10, k=2)
