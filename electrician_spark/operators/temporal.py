"""Temporal / ordered-data operators: as-of join, interval (range) join,
and hierarchical time rollup.

The reference engine processes ordered event streams through Go channels
(pkg/internal/relay/receiver.go resequencing, pkg/internal/trigger
time-window logic); the batch-analytics equivalents of "join each event
to the latest state before it", "find events inside a time window", and
"maintain multi-resolution aggregates" are expressed here Spark-first:

- ``asof_join``: union + per-key window ``last(ignorenulls)`` — one
  shuffle on the key, a per-partition sort, zero Python. Identical cost
  shape to a sort-merge join; Catalyst codegens the whole thing.
- ``range_join``: bucketized equi-join. A bare inequality join between
  two large sides is a BroadcastNestedLoopJoin (O(N*M) — a plan that
  never finishes at 100 TB); mapping both sides onto fixed-width buckets
  turns it into a shuffle hash join whose candidate count is bounded by
  interval-length / bucket-width.
- ``hypertable_rollup``: cascade fine->coarse (minute partials feed hour,
  hour feeds day) so the raw table is scanned and shuffled once at the
  finest grain; coarser grains re-aggregate partials that are orders of
  magnitude smaller. Spark reuses the finest-grain exchange across the
  union branches (ReusedExchange), so the cascade costs one wide job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    direction: str = "backward",
    tolerance: Column | None = None,
    right_suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: attach to each left row the nearest right row at
    or before (``backward``) / at or after (``forward``) its ``on``
    value, per ``by`` key. Unmatched / out-of-tolerance left rows keep
    NULL right columns (left-join semantics).

    Implementation is union-then-window rather than a per-key
    ``merge_asof`` in Python: both sides are tagged, unioned, and a
    window partitioned by ``by`` ordered by (``on``, side) carries the
    last non-null right-payload struct to each left row. That is one
    hash shuffle on ``by`` plus a per-partition sort — the same physical
    cost as the sort-merge join Spark would pick for an equi-join on
    ``by`` — and stays entirely inside whole-stage codegen.

    ``by`` is required: it is both the join semantics and the
    parallelism unit (a keyless as-of would be a single global sort
    partition — at cluster scale, express that as a range_join instead).

    ``tolerance``: a Column interval/numeric bound; matches farther than
    this from the left ``on`` are nulled out (pandas ``merge_asof``
    tolerance semantics).
    """
    if not by:
        raise ValueError("asof_join requires at least one `by` key (parallelism unit)")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    payload_cols = [c for c in right.columns if c not in (*by, on)]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    matched_on = f"{on}{right_suffix}"
    r_struct = F.struct(F.col(on).alias(matched_on), *payload_cols).alias("__rp")
    # Right rows must sort before left rows at equal `on` for backward
    # (inclusive match), after for forward.
    r_side, l_side = (0, 1) if direction == "backward" else (1, 0)
    r2 = right.select(
        *[F.col(c) for c in by], F.col(on), F.lit(r_side).alias("__side"), r_struct
    )
    l_extra = [c for c in left.columns if c not in (*by, on)]
    l2 = left.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(r2.schema["__rp"].dataType).alias("__rp"),
        *l_extra,
    )
    r2 = r2.select(*l2.columns[:4], *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_extra])

    w = Window.partitionBy(*by).orderBy(F.col(on), F.col("__side"))
    if direction == "backward":
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last("__rp", ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first("__rp", ignorenulls=True).over(w)

    u = l2.unionByName(r2).withColumn("__rp", carry).filter(F.col("__side") == F.lit(l_side))
    if tolerance is not None:
        gap = (
            F.col(on) - F.col("__rp")[matched_on]
            if direction == "backward"
            else F.col("__rp")[matched_on] - F.col(on)
        )
        u = u.withColumn(
            "__rp", F.when(gap <= tolerance, F.col("__rp"))  # NULL when no match/too far
        )
    out_cols = [*by, on, *l_extra, F.col(f"__rp.{matched_on}").alias(matched_on)]
    out_cols += [F.col(f"__rp.{c}").alias(c) for c in payload_cols]
    return u.select(*out_cols)


def range_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float | int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` — with NO equi-key. Columns of both inputs are
    returned side by side (they must not collide).

    All three columns must be numeric (cast timestamps with
    ``epoch_micros`` first — see q_rj1). Without help Spark plans a bare
    inequality join as BroadcastNestedLoopJoin: O(points × intervals)
    comparisons and a broadcast of a whole side. Bucketizing makes it a
    plain shuffle hash equi-join: each point hashes to
    ``floor(p/width)``; each interval replicates to the
    ``floor(lo/width) .. floor(hi/width)`` bucket range (sequence +
    explode, JVM-side); the equi-join on bucket id then prunes to
    candidates sharing a bucket, and the exact predicate filters those.

    Scale knob: ``bucket_width`` ≈ the typical interval length.
    Replication factor is ``len/width + 1`` per interval; candidate
    count per point is the number of intervals overlapping its bucket.
    Both degrade gracefully (AQE splits skewed buckets); correctness is
    width-independent.
    """
    if how != "inner":
        raise ValueError("range_join currently supports how='inner'")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    w = float(bucket_width)
    if not w > 0:
        raise ValueError("bucket_width must be > 0")

    pb = points.withColumn("__bucket", F.floor(F.col(point_col) / F.lit(w)))
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)), F.floor(F.col(hi_col) / F.lit(w))
            )
        ),
    )
    joined = pb.join(ib, "__bucket").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bucket")


#: grain name -> (date_trunc unit, ordering rank fine->coarse)
_GRAINS = {"minute": 0, "hour": 1, "day": 2, "week": 3, "month": 4, "year": 5}


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grains: Sequence[str] = ("minute", "hour", "day"),
) -> DataFrame:
    """Multi-resolution time aggregation (the batch analogue of a
    Timescale-style hypertable continuous aggregate): one output row per
    (grain, bucket) with count / sum / min / max of ``value_col``.

    The raw table is aggregated ONCE at the finest grain; every coarser
    grain re-aggregates the next-finer partials (count→sum, sum→sum,
    min→min, max→max are all re-aggregable). The finer-grain exchanges
    appear verbatim in every coarser union branch, and AQE's runtime
    exchange reuse collapses them (ReusedExchange in the post-execution
    plan — pinned by test_temporal), so raw-data scan + shuffle happen
    once and the cascade's extra cost is proportional to the tiny
    partial tables. At
    100 TB each level would be written out and the next level computed
    from the stored partials; the plan shape here is exactly that
    incremental-maintenance recurrence.

    Output: (grain string, bucket_ts timestamp, n bigint, sum_value,
    min_value, max_value). ``sum_value`` is NOT rounded — callers that
    hash-compare across engines should round at the edge.
    """
    grains = list(grains)
    if not grains:
        raise ValueError("need at least one grain")
    order = [g for g in _GRAINS if g in grains]
    if set(order) != set(grains):
        unknown = sorted(set(grains) - set(_GRAINS))
        raise ValueError(f"unknown grains {unknown}; supported: {list(_GRAINS)}")

    finest = order[0]
    level = (
        df.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket_ts"))
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    out = level.select(F.lit(finest).alias("grain"), "*")
    for g in order[1:]:
        level = (
            level.groupBy(F.date_trunc(g, F.col("bucket_ts")).alias("bucket_ts"))
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        out = out.unionByName(level.select(F.lit(g).alias("grain"), "*"))
    return out
