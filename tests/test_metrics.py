"""Meter tests — counters/ratio ride the plan via observe; threshold
alarm aborts (reference meter/monitor.go:23-60)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electrician_spark.metrics import Meter


def test_meter_counts_and_error_pct(spark):
    df = spark.createDataFrame(
        [(i, "error" if i % 4 == 0 else "ok") for i in range(100)], "id int, status string"
    )
    meter = Meter(error_cond=F.col("status") == "error")
    observed = meter.attach(df)
    observed.write.format("noop").mode("overwrite").save()
    r = meter.reading()
    assert r.processed == 100
    assert r.errors == 25
    assert r.error_pct == pytest.approx(25.0)


def test_meter_threshold_abort(spark):
    df = spark.createDataFrame([(1, "error"), (2, "ok")], "id int, status string")
    meter = Meter(error_cond=F.col("status") == "error")
    meter.attach(df).collect()
    with pytest.raises(RuntimeError, match="aborting"):
        meter.reading().check(10.0)
    meter2 = Meter(error_cond=F.col("status") == "never")
    meter2.attach(df).collect()
    meter2.reading().check(10.0)  # no error → no raise
