"""Relational operators — the engine's core query surface.

The reference has no SQL layer; its "queries" are composed transformer
chains plus source pushdown config (SURVEY §0). Here every capability is
declared through the DataFrame API so Catalyst plans it: filters and
projections reach the parquet scan, small dimensions broadcast, TopK
becomes TakeOrderedAndProject, and aggregation is partial (map-side)
before the shuffle.

Scale notes (100 TB):
- ``pricing_summary`` groups on 2 low-cardinality keys → partial agg
  collapses each map task to a handful of rows; the shuffle is tiny
  regardless of input size.
- ``grouped_top_k`` uses a window over ``partitionBy(group)``; at scale
  the shuffle is by group key — if a single group is hot, AQE skew-join
  handling doesn't apply to windows, so prefer ``top_k_per_group_agg``
  (max_by / slice of a sorted collect within a bounded k) for skewed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def round2(c: Column) -> Column:
    return F.round(c, 2)


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount) — the classic derived measure
    (reference transformer-chain analog, SURVEY Q-T1)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def pricing_summary(lineitem: DataFrame, cutoff: str) -> DataFrame:
    """TPC-H Q1 shape — the meter's count/sum/avg/ratio family over groups
    (reference meter counters, pkg/internal/meter/metrics.go:59-97).

    Doubles rounded: sums to 2dp, avgs to 6dp, so the result is stable
    against floating-point summation-order differences across engines.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round2(F.sum("l_quantity")).alias("sum_qty"),
            round2(F.sum("l_extendedprice")).alias("sum_base_price"),
            round2(F.sum(revenue_expr())).alias("sum_disc_price"),
            round2(F.sum(revenue_expr() * (1 + F.col("l_tax")))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k. ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — each partition keeps k rows, the driver merges;
    no full sort, no full shuffle (reference O3 'keep 5 largest peaks',
    example/wave_encoding_example/main.go:43-60)."""
    return df.orderBy(*order_cols).limit(k)


def grouped_top_k(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int, rn_col: str = "rn"
) -> DataFrame:
    """Top-k per group via row_number window (reference O1 priority dequeue
    per component; SURVEY Q-O2). Shuffles once on the group key."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rn_col, F.row_number().over(w)).filter(F.col(rn_col) <= k)
