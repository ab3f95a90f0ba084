"""Priority-queue semantics (reference "resister").

The reference maintains a max-heap of elements ordered by effective
priority, where priority *ages*: +1 per minute in queue plus the retry
count (/root/reference/pkg/internal/types/element.go:80-98;
pkg/internal/resister/queue.go:11-165).

Spark-first mapping: the queue is a DataFrame (or a retry *table* at
scale); effective priority is a recomputed column expression, and a
"drain" is an ORDER BY effective_priority DESC. No state to manage —
each micro-batch / scheduled run recomputes aging from event_time, which
is exactly what the reference's aging tick does, but declaratively.
At 100 TB a full sort is unnecessary: draining the next N items is
TakeOrderedAndProject (top-k), which never materializes a total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def effective_priority(
    base_priority: Column, event_time: Column, now: Column, retry_count: Column | None = None
) -> Column:
    """base + minutes-in-queue + retry_count
    (types/element.go:80-87 ComputeEffectivePriority)."""
    # cast("timestamp") accepts both TIMESTAMP and TIMESTAMP_NTZ parquet
    # columns (Spark 4 infers NTZ for non-UTC-adjusted files); with the
    # session pinned to UTC the numeric micros are identical either way.
    age_minutes = F.floor(
        (F.unix_micros(now.cast("timestamp")) - F.unix_micros(event_time.cast("timestamp")))
        / 60_000_000
    )
    eff = base_priority + age_minutes
    if retry_count is not None:
        eff = eff + retry_count
    return eff


def drain(
    df: DataFrame,
    priority_col: Column,
    n: int,
    tiebreak: list[Column],
) -> DataFrame:
    """Dequeue the top-n items by effective priority (max-heap pop ≡
    top-k by priority desc). Deterministic via explicit tiebreak keys."""
    return df.orderBy(priority_col.desc(), *tiebreak).limit(n)
