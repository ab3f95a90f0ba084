"""Heavy hitters: MG superset guarantee, exactness of the verify
pass, partitioning independence, and the broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electrician_spark.operators import heavyhitters as hh


def _skewed(spark, parts=8):
    # key 0: 500 rows, key 1: 200, keys 2..101: 5 each (N=1200).
    hot = spark.range(500).select(F.lit(0).alias("k"))
    warm = spark.range(200).select(F.lit(1).alias("k"))
    cold = spark.range(500).select((F.col("id") % 100 + 2).alias("k"))
    return hot.unionAll(warm).unionAll(cold).repartition(parts)


def test_mg_absorb_bounds_counters():
    c = {}
    c = hh._mg_absorb(c, ["a", "b", "c"], [10, 6, 1], k=2)
    assert len(c) <= 2 and c["a"] == 9  # spilled the 3rd-largest (1)
    c = hh._mg_absorb(c, ["d"], [100], k=2)
    assert len(c) <= 2 and "d" in c


def test_exact_counts_and_threshold(spark):
    out = {r.k: r.n for r in hh.heavy_hitters(_skewed(spark), "k", 150, k=16).collect()}
    assert out == {0: 500, 1: 200}


def test_partitioning_independent(spark):
    a = sorted(map(tuple, hh.heavy_hitters(_skewed(spark, 2), "k", 150, k=16).collect()))
    b = sorted(map(tuple, hh.heavy_hitters(_skewed(spark, 32), "k", 150, k=16).collect()))
    assert a == b


def test_candidates_superset_of_true_heavy(spark):
    # k=3 per partition still may keep extras, but every key with
    # global count > N/(k+1) must appear.
    cand = {r.k for r in hh.frequent_candidates(_skewed(spark), "k", k=3).collect()}
    assert {0, 1} <= cand


def test_no_false_positives_even_with_tiny_k(spark):
    # Tiny k floods phase 1 with junk candidates; verify pass must
    # still emit only keys truly over threshold.
    out = {r.k: r.n for r in hh.heavy_hitters(_skewed(spark), "k", 150, k=2).collect()}
    assert set(out) <= {0, 1}


def test_validation(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        hh.heavy_hitters(df, "k", 0)
    with pytest.raises(ValueError):
        hh.frequent_candidates(df, "k", 0)


def test_broadcast_verify_plan(spark):
    plan = (
        hh.heavy_hitters(_skewed(spark), "k", 150, k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
