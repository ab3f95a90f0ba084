"""Column profiling: the first query anyone runs against a new 100 TB
drop (null rates, cardinalities, ranges), as one Spark job.

Reference parity: the meter exposes per-metric counters
(``pkg/internal/meter/metrics.go:59-97``) and consumers eyeball feed
health from them; a columnar engine can answer "is this feed sane"
directly — per-column null fraction, distinct count, min/max — before
any pipeline logic runs.

Shape: ONE wide aggregate over the input (every per-column statistic
is an agg expression, so the scan happens once), then an explode of
the single result row into long format (column, stat columns) — the
explode touches one row, so it is free.

Scale notes (100 TB):
- ``approx=True`` (default) uses HyperLogLog++
  (``approx_count_distinct``, rsd 1.6%) — one pass, no shuffle of
  distinct values, constant memory per column. This is the only sane
  default at scale.
- ``approx=False`` uses exact ``count(DISTINCT)``; Spark expands
  multiple distinct aggregates into one multi-phase plan — correct,
  oracle-able, and linear-shuffle-per-column. Use for driver-gate
  verification and small tables.
- min/max/null-count are plain partial aggregates either way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: Sequence[str] | None = None, approx: bool = True
) -> DataFrame:
    """Long-format profile: one row per column with ``column``,
    ``n_rows``, ``n_nulls``, ``n_distinct``, ``min_value`` /
    ``max_value`` (rendered as strings so heterogeneous column types
    coexist; keep numeric columns integer/string-typed if the output
    must be compared across engines — float formatting is not
    portable)."""
    cols = list(columns) if columns is not None else [f.name for f in df.schema.fields]
    if not cols:
        raise ValueError("no columns to profile")
    distinct = (
        F.approx_count_distinct if approx else F.count_distinct
    )
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__nulls_{c}"),
            distinct(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    # One result row → long format via an inline array of structs; the
    # explode runs on a single row, so this stays driver-light and
    # avoids k separate jobs.
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.col("__n").alias("n_rows"), F.explode(entries).alias("e"))
        .select("e.column", "n_rows", "e.n_nulls", "e.n_distinct", "e.min_value", "e.max_value")
    )
