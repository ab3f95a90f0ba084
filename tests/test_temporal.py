from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from electrician_spark.operators import temporal


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _asof_fixtures(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(10), "b"), (2, _ts(3), "c"), (3, _ts(7), "d")],
        "uid long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 10.0), (1, _ts(10), 20.0), (2, _ts(9), 30.0)],
        "uid long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_unmatched(spark):
    left, right = _asof_fixtures(spark)
    out = {
        (r["uid"], r["ts"].minute): (r["ts_r"].minute if r["ts_r"] else None, r["v"])
        for r in temporal.asof_join(left, right, on="ts", by=["uid"]).collect()
    }
    assert out == {
        (1, 5): (4, 10.0),   # most recent at-or-before
        (1, 10): (10, 20.0),  # equal ts matches (inclusive)
        (2, 3): (None, None),  # right row is later -> no backward match
        (3, 7): (None, None),  # key absent on right
    }


def test_asof_forward_and_tolerance(spark):
    left, right = _asof_fixtures(spark)
    fwd = {
        (r["uid"], r["ts"].minute): r["ts_r"].minute if r["ts_r"] else None
        for r in temporal.asof_join(left, right, on="ts", by=["uid"], direction="forward").collect()
    }
    assert fwd == {(1, 5): 10, (1, 10): 10, (2, 3): 9, (3, 7): None}
    tol = {
        (r["uid"], r["ts"].minute): r["v"]
        for r in temporal.asof_join(
            left, right, on="ts", by=["uid"], tolerance=F.expr("INTERVAL 1 MINUTE")
        ).collect()
    }
    # (1,5) matched at distance 1m: kept; (1,10) at 0m: kept; others null.
    assert tol == {(1, 5): 10.0, (1, 10): 20.0, (2, 3): None, (3, 7): None}


def test_asof_rejects_keyless_and_collisions(spark):
    left, right = _asof_fixtures(spark)
    with pytest.raises(ValueError, match="by"):
        temporal.asof_join(left, right, on="ts", by=[])
    with pytest.raises(ValueError, match="collide"):
        temporal.asof_join(left, right.withColumnRenamed("v", "tag"), on="ts", by=["uid"])


def test_asof_plan_is_single_shuffle_no_python(spark):
    left, right = _asof_fixtures(spark)
    plan = temporal.asof_join(left, right, on="ts", by=["uid"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one exchange per input branch feeding one window sort; no join node at all
    assert "Join" not in plan


@pytest.mark.parametrize("width", [7.0, 60.0, 1000.0])
def test_range_join_matches_naive_for_any_width(spark, width):
    points = spark.createDataFrame([(i, float(i * 13 % 97)) for i in range(60)], "pid long, v double")
    iv = spark.createDataFrame(
        [(j, float(j * 10), float(j * 10 + 15)) for j in range(12)], "iid long, lo double, hi double"
    )
    got = {
        (r["pid"], r["iid"])
        for r in temporal.range_join(points, "v", iv, "lo", "hi", bucket_width=width).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(iv).where((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))).collect()
    }
    assert got == naive and len(naive) > 0


def test_range_join_avoids_nested_loop(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    iv = spark.createDataFrame([(1, 0.0, 10.0)], "iid long, lo double, hi double")
    plan = (
        temporal.range_join(points, "v", iv, "lo", "hi", bucket_width=10.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_hypertable_rollup_cascade_and_reused_exchange(spark):
    rows = [
        (dt.datetime(2024, 1, 1, h, m, 30), float(h * 60 + m))
        for h in (0, 1) for m in (0, 1, 1, 59)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = temporal.hypertable_rollup(df, "ts", "value")
    rolled = {(r["grain"], r["bucket_ts"]): (r["n"], r["sum_value"]) for r in out.collect()}
    assert rolled[("minute", dt.datetime(2024, 1, 1, 0, 1))] == (2, 2.0)
    assert rolled[("hour", dt.datetime(2024, 1, 1, 1, 0))] == (4, 60.0 + 61.0 * 2 + 119.0)
    assert rolled[("day", dt.datetime(2024, 1, 1))] == (8, sum(v for _, v in rows))
    # day reuses hour partials which reuse minute partials: the raw-side
    # exchange appears once, reused by the coarser branches.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_hypertable_rollup_validates_grains(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 1, 1), 1.0)], "ts timestamp, value double")
    with pytest.raises(ValueError, match="unknown grains"):
        temporal.hypertable_rollup(df, "ts", "value", grains=("minute", "fortnight"))
