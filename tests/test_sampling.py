import pytest
from pyspark.sql import functions as F

from electrician_spark.operators import sampling


def test_hash_sample_deterministic_and_bounded(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = sorted(r.doc_id for r in sampling.hash_sample(df, 0.25).collect())
    b = sorted(r.doc_id for r in sampling.hash_sample(df, 0.25).collect())
    assert a == b  # same rows every run
    assert 150 < len(a) < 350  # ~25% of 1000, md5-uniform
    # monotone: a smaller fraction yields a subset
    c = set(r.doc_id for r in sampling.hash_sample(df, 0.1).collect())
    assert c <= set(a)


def test_hash_sample_rejects_bad_fraction(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        sampling.hash_sample(df, 1.5)


def test_stratified_sample_quota_per_stratum(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    out = sampling.stratified_sample(df, ["lang"], 7)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 7, "1": 7, "2": 7}
    # small stratum keeps everything
    tiny = df.filter(F.col("doc_id") < 2)
    assert sampling.stratified_sample(tiny, ["lang"], 7).count() == 2
