"""Scalar quantization for embedding columns: float32 → b-bit codes.

The ANN memory lever at 100 TB: a 64-dim float32 embedding is 256 B;
its int8 codes are 64 B — 4× more vectors per executor page, which is
the difference between an in-memory IVF probe and a spilled one. This
is symmetric scalar quantization (per-dimension min/max, uniform
levels) — the standard first rung below product quantization; PQ slots
in behind the same bounds-table shape if recall demands it.

Plan shape:
1. **Bounds pass** — `posexplode` → `groupBy(dim)` min/max: codegen'd
   all the way, one shuffle of d rows per input partition (map-side
   combined), output = d rows total.
2. **Encode pass** — bounds collapse to one row of sorted arrays,
   broadcast-joined onto every vector; the code for element i is
   ``least(levels-1, floor((x - lo_i) · levels / span_i))`` via
   `transform` with its index-lambda form. Pure Column expressions:
   no UDF, no shuffle of the vectors themselves.

Everything is computed in float64 on both sides of the oracle fence
(elements cast before any arithmetic), and the bucketing uses
``floor`` (exact) rather than ``round`` (half-boundary hazard), so
codes are bit-identical across engines.

Degenerate dimensions (hi == lo) encode as 0 and decode back to the
constant ``lo`` — no NaNs from the zero span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantization_bounds(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension corpus bounds: (dim, lo, hi) with ``dim`` 0-based.
    One codegen aggregation; d rows out."""
    exploded = df.select(F.posexplode(vec_col).alias("dim", "x")).select(
        "dim", F.col("x").cast("double").alias("x")
    )
    return exploded.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )


def _bounds_row(bounds: DataFrame) -> DataFrame:
    """Collapse the bounds table to a single row of dim-ordered arrays
    (collect_list order is nondeterministic — sort by dim explicitly)."""
    packed = bounds.agg(
        F.array_sort(F.collect_list(F.struct("dim", "lo", "hi"))).alias("b")
    )
    return packed.select(
        F.transform("b", lambda s: s["lo"]).alias("_q_lo"),
        F.transform("b", lambda s: s["hi"]).alias("_q_hi"),
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str, bits: int = 8, out_col: str | None = None
) -> DataFrame:
    """Append ``{vec_col}_q`` (array<int> codes in [0, 2^bits)). The
    bounds table is computed from ``df`` itself; persist it separately
    when encoding queries against a frozen corpus codebook."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    levels = 1 << bits
    out = out_col or f"{vec_col}_q"
    with_bounds = df.crossJoin(F.broadcast(_bounds_row(quantization_bounds(df, vec_col))))

    def code(x: Column, i: Column) -> Column:
        # transform's index lambda form: i is 0-based; F.get is the
        # 0-based, Column-index array accessor.
        lo = F.get(F.col("_q_lo"), i)
        span = F.get(F.col("_q_hi"), i) - lo
        raw = F.floor((x.cast("double") - lo) * F.lit(float(levels)) / span)
        clamped = F.least(F.lit(levels - 1), F.greatest(F.lit(0), raw))
        return F.when(span > 0, clamped).otherwise(F.lit(0)).cast("int")

    return with_bounds.withColumn(out, F.transform(vec_col, code)).drop(
        "_q_lo", "_q_hi"
    )


def dequantize(
    codes: Column, lo: Column, hi: Column, bits: int = 8
) -> Column:
    """Reconstruct bucket-midpoint float64 values from codes + the
    per-dimension bounds arrays (same dim order as the encoder)."""
    levels = 1 << bits

    def value(c: Column, i: Column) -> Column:
        lo_i = F.get(lo, i)
        span = F.get(hi, i) - lo_i
        return lo_i + (c.cast("double") + 0.5) * span / F.lit(float(levels))

    return F.transform(codes, value)
