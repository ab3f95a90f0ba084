"""OLAP operators: quantile exactness/approx bound, rollup levels,
histogram clamping, and the plans that make them scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electrician_spark.operators import olap


@pytest.fixture(scope="module")
def values(spark):
    # 0..999 in one group, 0..499 doubled in another.
    a = spark.range(1000).select(F.lit("a").alias("g"), F.col("id").cast("double").alias("v"))
    b = spark.range(500).select(F.lit("b").alias("g"), (F.col("id") * 2).cast("double").alias("v"))
    return a.unionAll(b)


def test_exact_quantiles_interpolate(spark, values):
    rows = {
        r["g"]: r
        for r in olap.grouped_quantiles(values, "v", (0.5, 0.9), ["g"]).collect()
    }
    # 0..999: p50 = 499.5 (rank 0.5*999), p90 = 899.1
    assert rows["a"]["p50"] == 499.5
    assert rows["a"]["p90"] == 899.1
    # 0,2,..,998: p50 = 499.0
    assert rows["b"]["p50"] == 499.0


def test_approx_quantiles_within_rank_error(spark, values):
    exact = olap.grouped_quantiles(values, "v", (0.5, 0.99), ["g"]).collect()
    approx = {
        r["g"]: r
        for r in olap.approx_quantiles(values, "v", (0.5, 0.99), ["g"], accuracy=100).collect()
    }
    for row in exact:
        g = row["g"]
        for p in ("p50", "p99"):
            # accuracy=100 → rank error ≤ 1% of 1000 rows ≈ 10 value units
            # in these arithmetic sequences (20 for the stride-2 group).
            assert abs(approx[g][p] - row[p]) <= 25, (g, p, approx[g][p], row[p])


def test_quantile_alias_naming():
    assert olap._prob_alias(0.5) == "p50"
    assert olap._prob_alias(0.999) == "p99_9"


def test_rollup_levels_and_bitmask(spark, values):
    out = olap.rollup_agg(values, ["g"], [F.count("*").alias("n")]).collect()
    by_level = {r["grouping_level"]: r for r in out if r["grouping_level"] == 1}
    detail = [r for r in out if r["grouping_level"] == 0]
    assert len(detail) == 2
    assert by_level[1]["n"] == 1500 and by_level[1]["g"] is None


def test_cube_produces_all_combinations(spark, values):
    two = values.withColumn("h", (F.col("v") % 2).cast("int"))
    out = olap.cube_agg(two, ["g", "h"], [F.count("*").alias("n")]).collect()
    levels = sorted({r["grouping_level"] for r in out})
    assert levels == [0, 1, 2, 3]


def test_histogram_clamps_and_counts(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (19.9,), (25.0,)], ["v"]
    )
    rows = {r["bucket"]: r for r in olap.histogram(df, "v", 0.0, 20.0, 4).collect()}
    # -5 clamps into bucket 0; 25 clamps into bucket 3.
    assert rows[0]["n"] == 3 and rows[0]["bucket_lo"] == 0.0
    assert rows[1]["n"] == 1
    assert rows[3]["n"] == 2 and rows[3]["bucket_lo"] == 15.0


def test_histogram_validation(spark):
    df = spark.range(1).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        olap.histogram(df, "v", 0.0, 10.0, 0)
    with pytest.raises(ValueError):
        olap.histogram(df, "v", 10.0, 10.0, 4)


def test_rollup_single_shuffle_plan(spark, values):
    # Expand + partial HashAggregate before ONE exchange: the subtotal
    # grid must not re-shuffle per level.
    plan = (
        olap.rollup_agg(values, ["g"], [F.count("*").alias("n")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Expand" in plan


def test_histogram_map_side_combine_plan(spark, values):
    plan = (
        olap.histogram(values, "v", 0.0, 1000.0, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2, plan


def test_clip_quantiles_bounds_applied(spark):
    df = spark.range(101).select(F.col("id").cast("double").alias("v"))
    out = olap.clip_quantiles(df, "v", plo=0.1, phi=0.9)
    vals = sorted(r["v_clipped"] for r in out.collect())
    # p10 of 0..100 = 10.0, p90 = 90.0
    assert vals[0] == 10.0 and vals[-1] == 90.0
    assert len(vals) == 101  # every row kept, original column intact


def test_clip_quantiles_grouped_and_validation(spark):
    df = spark.range(200).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    out = olap.clip_quantiles(df, "v", 0.0, 1.0, ["g"])
    assert out.count() == 200  # identity clip keeps everything
    import pytest as _pytest

    with _pytest.raises(ValueError):
        olap.clip_quantiles(df, "v", 0.9, 0.1)


def test_clip_quantiles_broadcasts_bounds(spark):
    df = spark.range(100).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    plan = (
        olap.clip_quantiles(df, "v", 0.05, 0.95, ["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_profile_exact_and_approx(spark):
    from electrician_spark.operators import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], ["k", "v"]
    )
    rows = {r["column"]: r for r in profile.profile_table(df, approx=False).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nulls"] == 1
    assert rows["k"]["n_distinct"] == 2 and rows["k"]["min_value"] == "1"
    assert rows["v"]["n_distinct"] == 2 and rows["v"]["max_value"] == "b"
    # approx: HLL estimate within rsd on tiny cardinalities is exact
    arows = {r["column"]: r for r in profile.profile_table(df).collect()}
    assert arows["k"]["n_distinct"] == 2


def test_profile_single_scan_plan(spark):
    from electrician_spark.operators import profile

    df = spark.range(100).select(F.col("id").alias("a"), (F.col("id") % 3).alias("b"))
    plan = (
        profile.profile_table(df, approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # approx profile: one aggregate pass, no Expand (exact multi-distinct
    # would expand), no per-column jobs.
    assert "Expand" not in plan, plan


def test_profile_validation(spark):
    from electrician_spark.operators import profile

    df = spark.range(1)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile.profile_table(df, [])
