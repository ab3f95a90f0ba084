"""Heavy hitters at corpus scale: sketch candidates, verify exactly.

Reference parity: the meter's exact per-name counters
(``pkg/internal/meter/metrics.go:59-97``) enumerate every key they
count — fine for metric names, impossible for "which user_ids /
domains / shingles appear more than T times in 100 TB", where the
distinct-key set itself dwarfs executor memory and a plain
``GROUP BY key HAVING count >= T`` shuffles *every* distinct key.

Two-phase plan that shuffles only the plausible winners:

1. **Candidates** — a Misra-Gries summary of ``k`` counters per input
   partition (``mapInPandas``, streaming over Arrow batches, O(k)
   memory). MG guarantee: any key whose count in a partition exceeds
   ``n_p/(k+1)`` survives that partition's summary; summing over
   partitions, any key with global count > N/(k+1) survives in at
   least one partition. Choose ``k + 1 ≥ N/threshold`` (i.e. ``k``
   ≥ 1/φ for φ = threshold/N) and the union of partition summaries is
   a *superset* of the true heavy hitters — no false negatives.
2. **Exact verify** — broadcast the candidate keys (≤ k per
   partition, typically thousands), left-semi join the corpus, count
   only those keys, filter ≥ threshold. Map-side combine means the
   shuffle carries one row per (partition, candidate).

The output is exactly the keys with true count ≥ threshold and their
exact counts — deterministic regardless of partitioning (the MG phase
only affects which *extra* candidates get disproven in phase 2), so
the operator is oracle-comparable against ``GROUP BY ... HAVING``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_absorb(counters: dict, keys, counts, k: int) -> dict:
    """Fold a batch of (key, count) into a Misra-Gries summary of at
    most ``k`` counters (the mergeable weighted form of Agarwal et
    al. 2012: add, then subtract the (k+1)-th largest count from all
    and drop the non-positive)."""
    for key, c in zip(keys, counts):
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) > k:
        spill = sorted(counters.values(), reverse=True)[k]
        counters = {key: v - spill for key, v in counters.items() if v > spill}
    return counters


def frequent_candidates(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (≤ ``k`` per
    partition), distinct across partitions. Superset of every key with
    global count > N/(k+1); not exact — feed to :func:`heavy_hitters`
    or your own verify pass."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keyed = df.select(key_col)
    schema = keyed.schema

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for b in batches:
            vc = b[key_col].value_counts(dropna=True)
            counters = _mg_absorb(counters, vc.index.to_numpy(), vc.to_numpy(), k)
        yield pd.DataFrame({key_col: pd.Series(list(counters.keys()))})

    return keyed.mapInPandas(summarize, schema=schema).distinct()


def heavy_hitters(
    df: DataFrame, key_col: str, threshold: int, k: int = 256
) -> DataFrame:
    """Exact ``(key, n)`` for every key with count ≥ ``threshold``,
    without shuffling the full distinct-key set. ``k`` must satisfy
    ``k + 1 ≥ N/threshold`` for the no-false-negative guarantee — at
    100 TB that means k in the thousands for per-mille thresholds,
    still O(k) executor memory. The verify pass makes the result exact
    and partitioning-independent either way *provided* the guarantee
    holds; sizes are asserted nowhere (N is unknown at plan time), so
    callers own the k-vs-threshold arithmetic."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    cands = frequent_candidates(df, key_col, k)
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold)
    )
