"""Observability — the meter re-expressed (SURVEY §2.4).

The reference's Meter keeps 113 atomic counters with derived rates,
percentages, and threshold alarms
(/root/reference/pkg/internal/types/meter.go:9-126,
meter/metrics.go:59-97, monitor.go:23-60). Spark-first mapping:

- counters/ratios ride the query itself via ``DataFrame.observe`` —
  metrics accumulate during execution, zero extra passes and zero
  shuffle, the closest analog to the meter's in-band counting.
- rates = counts over event-time buckets (declared query Q-A2).
- threshold alarm / early abort (A4): check the observation after the
  action (batch) or per-batch in foreachBatch (streaming) and raise.
- streaming progress (processed rows/sec) comes from
  ``StreamingQuery.lastProgress`` — Spark's own meter.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class MeterReading:
    processed: int
    errors: int
    error_pct: float

    def check(self, error_pct_threshold: float) -> None:
        """Reference monitor.go:37-52: abort when error% ≥ threshold."""
        if self.error_pct >= error_pct_threshold:
            raise RuntimeError(
                f"meter: error ratio {self.error_pct:.2f}% >= {error_pct_threshold}% — aborting"
            )


class Meter:
    """Attach in-band counters to a plan; read after an action runs.

    >>> meter = Meter(error_cond=F.col("status") == "error")
    >>> df = meter.attach(df)
    >>> df.write.parquet(...)            # any action
    >>> meter.reading().check(5.0)
    """

    def __init__(self, error_cond=None, name: str = "meter"):
        self._obs = Observation(name)
        self._error_cond = error_cond

    def attach(self, df: DataFrame) -> DataFrame:
        err = self._error_cond if self._error_cond is not None else F.lit(False)
        return df.observe(
            self._obs,
            F.count(F.lit(1)).alias("processed"),
            F.sum(F.when(err, 1).otherwise(0)).alias("errors"),
        )

    def reading(self) -> MeterReading:
        got = self._obs.get
        processed = got["processed"] or 0
        errors = got["errors"] or 0
        pct = (100.0 * errors / processed) if processed else 0.0
        return MeterReading(processed=processed, errors=errors, error_pct=pct)


def streaming_rates(query) -> dict:
    """Meter rates for a streaming query (processed/sec ≈ the meter's
    items/s) from Spark's progress telemetry."""
    p = query.lastProgress
    if p is None:
        return {}
    return {
        "inputRowsPerSecond": p.get("inputRowsPerSecond"),
        "processedRowsPerSecond": p.get("processedRowsPerSecond"),
        "numInputRows": p.get("numInputRows"),
        "batchId": p.get("batchId"),
    }
