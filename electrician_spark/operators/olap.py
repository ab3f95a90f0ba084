"""OLAP summary operators: quantiles, multi-level rollups, histograms.

Reference parity: the meter surface (``pkg/internal/meter/metrics.go``)
exposes counters/rates only; its consumers build distribution views
(latency percentiles, size histograms, per-dimension subtotal grids)
downstream. These operators make those first-class, Spark-native:

- :func:`grouped_quantiles` — *exact* percentiles via ``F.percentile``
  (full sort within the aggregate; right for driver-verified
  correctness and modest group cardinality).
- :func:`approx_quantiles` — the 100 TB path: ``percentile_approx``
  (Greenwald-Khanna sketch, mergeable, fixed memory per group, one
  map-side-combinable aggregate; accuracy knob trades memory for
  error). Same call shape as the exact form, so callers can swap when
  the data outgrows exact sorting.
- :func:`rollup_agg` / :func:`cube_agg` — subtotal grids with a
  ``grouping_id`` level column. Spark expands grouping sets *before*
  the aggregate, so partial aggregation still applies — one shuffle
  total, not one per level.
- :func:`histogram` — fixed-range equi-width histogram as a pure
  integer-bucket groupBy: ``floor((x - lo)/width)`` clamped to
  ``[0, nbins)``. No sort, full map-side combine, deterministic
  across engines (IEEE double ops only, no libm).

Scale notes (100 TB):
- ``percentile`` (exact) buffers all values per group — fine when
  group count is large and per-group rows modest, wrong for one giant
  group; that's what :func:`approx_quantiles` is for.
- ``rollup``/``cube`` multiply input rows by the number of grouping
  sets *logically*, but Spark's Expand + partial HashAggregate
  combines map-side, so the shuffle carries one row per (group,
  level), not per input row.
- ``histogram`` shuffles ``nbins`` rows per group maximum —
  cardinality-bounded regardless of input size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _prob_alias(p: float) -> str:
    # 0.5 -> "p50", 0.99 -> "p99", 0.999 -> "p99_9"
    pct = p * 100
    if pct == int(pct):
        return f"p{int(pct)}"
    return "p" + f"{pct:g}".replace(".", "_")


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    group_cols: Sequence[str] = (),
    precision: int = 6,
) -> DataFrame:
    """Exact per-group percentiles (sorted, linearly interpolated at
    rank ``p*(n-1)`` — the same definition as ANSI
    ``percentile_cont``/DuckDB ``quantile_cont``, so results are
    oracle-comparable after rounding)."""
    aggs = [
        F.round(F.percentile(F.col(value_col), F.lit(float(p))), precision).alias(
            _prob_alias(p)
        )
        for p in probs
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    group_cols: Sequence[str] = (),
    accuracy: int = 10_000,
    precision: int = 6,
) -> DataFrame:
    """Scale path: Greenwald-Khanna sketch percentiles
    (``percentile_approx``). Rank error ≤ 1/accuracy of the group
    size, memory O(accuracy · log n) per group independent of rows,
    fully map-side combinable. Not bit-comparable to an exact oracle
    by construction — verify with :func:`grouped_quantiles` at small
    scale, run this at large scale."""
    aggs = [
        F.round(
            F.percentile_approx(F.col(value_col), F.lit(float(p)), F.lit(accuracy)),
            precision,
        ).alias(_prob_alias(p))
        for p in probs
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def clip_quantiles(
    df: DataFrame,
    value_col: str,
    plo: float = 0.01,
    phi: float = 0.99,
    group_cols: Sequence[str] = (),
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Winsorize: clamp ``value_col`` into its per-group
    [plo, phi] quantile range, appended as ``{value_col}_clipped`` —
    the standard outlier guard before training-statistics aggregation.

    Two jobs by construction: a quantile pass over the groups, then a
    broadcast join of the tiny bounds table back onto the input (group
    cardinality is human-scale; the input never shuffles). ``approx``
    swaps the exact sort-based percentile for the Greenwald-Khanna
    sketch — at 100 TB bounds don't need the exact rank."""
    if not 0.0 <= plo <= phi <= 1.0:
        raise ValueError(f"need 0 <= plo <= phi <= 1, got [{plo}, {phi}]")
    # Bounds rounded to 6dp (the quantile functions' default): a raw
    # interpolated double can differ in the last ulp across engines,
    # and the clip comparison would amplify that; 6dp is bit-stable.
    if approx:
        bounds = approx_quantiles(df, value_col, (plo, phi), group_cols, accuracy)
    else:
        bounds = grouped_quantiles(df, value_col, (plo, phi), group_cols)
    lo_name, hi_name = _prob_alias(plo), _prob_alias(phi)
    clipped = F.least(
        F.greatest(F.col(value_col), F.col(lo_name)), F.col(hi_name)
    ).alias(f"{value_col}_clipped")
    if group_cols:
        joined = df.join(F.broadcast(bounds), list(group_cols))
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    return joined.select(*df.columns, clipped)


def rollup_agg(
    df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Hierarchical subtotals: (a,b), (a), () levels with a
    ``grouping_level`` bitmask column (0 = detail row, each aggregated
    column contributes its bit, matching ANSI ``GROUPING(a,b)``)."""
    return df.rollup(*group_cols).agg(
        F.grouping_id().alias("grouping_level"), *aggs
    )


def cube_agg(
    df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """All 2^n subtotal combinations with the same ``grouping_level``
    bitmask as :func:`rollup_agg`."""
    return df.cube(*group_cols).agg(F.grouping_id().alias("grouping_level"), *aggs)


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-range equi-width histogram: rows outside [lo, hi) clamp
    into the edge buckets (so every row is counted, matching the usual
    monitoring-histogram convention). Returns one row per non-empty
    (group, bucket) with ``bucket`` (0-based), ``bucket_lo`` and
    ``n``. Only double +,-,*,/ and floor — bit-identical across
    engines."""
    if nbins < 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (float(hi) - float(lo)) / nbins
    raw = F.floor((F.col(value_col).cast("double") - F.lit(float(lo))) / F.lit(width))
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("long")
    keys = [*group_cols, bucket.alias("bucket")]
    out = df.groupBy(*keys).agg(F.count("*").alias("n"))
    return out.withColumn(
        "bucket_lo",
        F.round(F.lit(float(lo)) + F.col("bucket") * F.lit(width), 6),
    )
