"""Deterministic sampling operators for training-data pipelines.

Data mixing needs samples that are *reproducible across runs and
engines* — no RNG state, no partition-order dependence. Both operators
key randomness off md5 of a stable id, so the same corpus always yields
the same sample on any cluster size (and the DuckDB oracle can replay
it exactly).

Scale notes (100 TB):
- ``hash_sample`` is a pure filter — pushed to the scan, no shuffle,
  trivially parallel. This is the right tool for "take 1% of the
  corpus" at any scale.
- ``stratified_sample`` shuffles once on the strata key and ranks
  within each stratum. For pathological strata (one lang = 90% of the
  corpus) the sort-per-stratum dominates; pre-thin with ``hash_sample``
  at a fraction that still guarantees ≥ k survivors per stratum, then
  rank the survivors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key(id_col: Column) -> Column:
    """Deterministic uniform-ish sort key in [0, 2^32): the first 8 hex
    digits of md5 of the id rendered as a string."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5-derived key
    falls below ``fraction`` of the key space. Same rows every run."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * (1 << 32))
    return df.filter(sample_key(F.col(id_col)) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic quota sample: the ``k`` rows per stratum with the
    smallest md5-derived keys (ties broken by id). Every stratum keeps
    at most ``k`` rows regardless of its size — the standard data-mixing
    primitive (e.g. equal-per-language corpora)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_key(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
