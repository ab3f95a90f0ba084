"""Streaming enrichment joins (SURVEY §2.5 composition S6+C3).

The reference's core correlation pattern is "enrich a live event
stream with dimension metadata read from a store" — a Kafka consumer
whose payloads are joined against Postgres-loaded customer metadata
before forwarding (SURVEY §2.5; the kafka producer's key templates
`pkg/internal/adapter/kafkaclient/templates.go:9-60` exist precisely
to key the enriched records). The reference does this row-at-a-time
inside the conduit; the Spark-first forms are:

- **Stream-static join** (:func:`enrich_stream_static`): each
  micro-batch of an unbounded stream joins a BATCH dimension table.
  Spark re-evaluates the batch side every micro-batch (picking up
  slowly-changing dims on the next trigger), and a broadcast hint
  keeps every micro-batch's join a BroadcastHashJoin — no shuffle of
  the stream, which is the only acceptable shape at 100 TB/day event
  rates: the stream never repartitions, the dim ships once per
  executor. Stateless — nothing to watermark, append-mode safe.

- **Stream-stream interval join** (:func:`interval_join`): both sides
  unbounded, matched on equal keys within an event-time interval
  (click-within-N-minutes-of-impression). Both sides carry watermarks
  and the join condition carries the time bound, which is what lets
  Spark EVICT buffered state: a left row's state is dropped once the
  watermark passes ``left_ts + upper`` (no future right row could
  match it), so state is bounded by the interval + delay horizon
  instead of growing forever. Late rows (event time behind the
  watermark) are filtered before they can match — the observable form
  of eviction correctness, attested by q_sj1's post-eviction
  non-match.

Scale notes: the interval join shuffles BOTH streams by the equi-key
once (state store partitioning); the interval bound is applied inside
the state store, never as a nested loop. Skewed keys are bounded by
the watermark horizon — state per key is at most the rows arriving
within (upper - lower) + delay. The stream-static form never shuffles
the stream at all when the dim broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a streaming DataFrame with a batch dimension table
    (stream-static join — the S6+C3 composition: the dim is typically
    a Postgres/JDBC or parquet read, possibly itself pre-joined).

    ``broadcast_dim=True`` (default) pins the dim to the broadcast
    side so every micro-batch plans a BroadcastHashJoin: the stream
    side keeps its source partitioning — zero stream shuffle. Turn it
    off only when the dim is too large to broadcast, in which case
    Spark shuffles each micro-batch on the join key (the same flip a
    batch dimension join makes).

    ``how``: inner or left/left_outer — Spark supports exactly these
    for stream-static with the stream on the left; anything else
    raises here rather than at stream start."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"stream-static join supports inner/left only (stream side "
            f"preserved), got {how!r}"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "5 minutes",
    left_delay: str = "10 minutes",
    right_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on equal ``keys`` where ``right_ts`` falls in
    ``[left_ts + lower, left_ts + upper]`` (event-time interval join —
    impression→click attribution, order→shipment pairing).

    Both sides get ``withWatermark`` and the interval rides in the
    join condition, so Spark bounds the state store: left state
    evicts once the watermark passes ``left_ts + upper``, right state
    once it passes ``right_ts - lower``. Every key column and the two
    timestamp columns survive into the output; non-key columns must
    be disjoint between the sides (rename upstream — this keeps the
    output schema unambiguous without inventing prefixes).

    ``how``: inner (default) or left/right/full outer — outer sides
    emit their null-padded rows only once the watermark proves no
    match can arrive, the same eviction clock.

    ``lower`` may be negative (``'-2 minutes'``) for a bidirectional
    window — a click slightly BEFORE its impression still matches;
    state eviction bounds adjust symmetrically. An empty window
    (lower > upper) raises here rather than silently joining
    nothing."""
    import re as _re

    def _interval_seconds(s: str) -> float:
        m = _re.fullmatch(
            r"\s*(-?\d+(?:\.\d+)?)\s*(second|minute|hour|day)s?\s*", s
        )
        if not m:
            raise ValueError(
                f"unsupported interval {s!r} — use '<n> seconds|minutes|"
                f"hours|days' (optionally negative for lower)"
            )
        mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
        return float(m.group(1)) * mult[m.group(2)]

    if _interval_seconds(lower) > _interval_seconds(upper):
        raise ValueError(
            f"empty interval: lower {lower!r} > upper {upper!r} — no pair "
            f"could ever match"
        )
    lw = left.withWatermark(left_ts, left_delay)
    rw = right.withWatermark(right_ts, right_delay)
    overlap = (set(lw.columns) & set(rw.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns appear on both sides: {sorted(overlap)} — "
            f"rename upstream so the joined schema is unambiguous"
        )
    cond = None
    for k in keys:
        c = lw[k] == rw[k]
        cond = c if cond is None else cond & c
    lo = F.expr(f"INTERVAL {lower}")
    hi = F.expr(f"INTERVAL {upper}")
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts] + lo)
        & (rw[right_ts] <= lw[left_ts] + hi)
    )
    # collapse the duplicated key columns (equal by the join condition;
    # coalesce covers the outer sides where one is null)
    out_cols = [F.coalesce(lw[k], rw[k]).alias(k) for k in keys]
    out_cols += [lw[c] for c in lw.columns if c not in keys]
    out_cols += [rw[c] for c in rw.columns if c not in keys]
    return lw.join(rw, cond, how).select(*out_cols)
