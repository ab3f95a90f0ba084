"""Distinct-count sketches for corpus-scale cardinality estimation.

The reference's meter keeps exact atomic counters per metric name
(``pkg/internal/meter/metrics.go:59-97``); at 100 TB the analogous
"how many distinct users / URLs / documents" question cannot be
answered with ``count(DISTINCT x)`` without shuffling every distinct
value. These operators answer it with a fixed-size sketch built from
``k`` independent MIN aggregates over md5-derived hashes — the
KMV-family estimator (Bar-Yossef et al. 2002): for ``n`` distinct
values hashed uniformly into (0, 1], the expected minimum is
``1/(n+1)``, so ``n̂ = k / Σ mᵢ − 1`` averaged over ``k`` independent
hash functions, with relative error ~ ``1/√k``.

Scale notes (100 TB):
- The sketch is ``k`` ``min(...)`` aggregates → full map-side combine
  (partial_min per input partition); the shuffle carries ``k`` longs
  per group, never the distinct values themselves. Exact
  ``count(DISTINCT)`` shuffles every distinct value; this shuffles a
  constant 8·k bytes per group regardless of cardinality.
- Sketches form a monoid: union semantics = elementwise min. Build a
  sketch per day/partition/table, store the k registers, merge years
  of them without re-touching raw data (:func:`merge_sketches`).
- Everything is md5-keyed and expression-ordered, so the estimate is
  bit-identical across runs, cluster sizes, and engines — the DuckDB
  oracle replays it exactly (same hash, same left-assoc summation).

Determinism note: the register sum is built as a fixed left-associative
expression chain ``(h0 + h1) + h2 ...`` — one defined IEEE-754
evaluation order, not a parallel reduce — so cross-engine float
equality holds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KEY_SPACE = float(1 << 32)


def _register_hash(value: Column, seed: int) -> Column:
    """Seeded md5-derived hash in [0, 2^32) — the same first-8-hex-digit
    construction as ``sampling.sample_key`` with a ``{seed}:`` prefix,
    mirroring the minhash signature family (``dedup.minhash_signatures``)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), value.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def distinct_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 16,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group distinct-count sketch: ``k`` registers ``h0..h{k-1}``,
    register ``i`` = min over rows of the seed-``i`` hash of the value.

    One aggregation, fully map-side combinable; the result is the
    mergeable sketch, not the estimate — feed to
    :func:`estimate_distinct` or :func:`merge_sketches`.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    aggs = [
        F.min(_register_hash(F.col(value_col), i)).alias(f"h{i}") for i in range(k)
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def merge_sketches(
    a: DataFrame, b: DataFrame, k: int, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Union-of-inputs semantics: elementwise min of registers. Groups
    present in only one input keep that input's registers (min over the
    union). Exact — merging per-partition sketches equals sketching the
    concatenated data, so sketches can be stored and combined later."""
    unioned = a.unionByName(b)
    aggs = [F.min(f"h{i}").alias(f"h{i}") for i in range(k)]
    if group_cols:
        return unioned.groupBy(*group_cols).agg(*aggs)
    return unioned.agg(*aggs)


def estimate_distinct(sketch: DataFrame, k: int, precision: int = 6) -> DataFrame:
    """Estimate from a sketch table: ``n̂ = k / Σ (hᵢ+1)/2^32 − 1``
    rounded to ``precision`` decimals, registers dropped. The +1 maps
    the integer hash into (0, 2^32] so a register can never contribute
    a zero divisor."""
    total = None
    for i in range(k):
        term = (F.col(f"h{i}") + F.lit(1)) / F.lit(_KEY_SPACE)
        total = term if total is None else total + term
    est = F.round(F.lit(float(k)) / total - F.lit(1.0), precision)
    return sketch.withColumn("distinct_est", est).drop(*[f"h{i}" for i in range(k)])


def sketch_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 16,
    group_cols: Sequence[str] = (),
    precision: int = 6,
) -> DataFrame:
    """End-to-end convenience: sketch then estimate."""
    return estimate_distinct(
        distinct_sketch(df, value_col, k, group_cols), k, precision
    )
