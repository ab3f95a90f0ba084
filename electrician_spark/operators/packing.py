"""Sequence packing — concatenate-and-chunk documents into fixed
token-budget training sequences.

The standard pretraining data layout: documents are laid end-to-end
into a token stream and the stream is cut into ``budget``-sized
sequences (documents crossing a cut are split across the two packs).
The assignment is pure arithmetic over a deterministic document order,
so it is reproducible across runs/engines and expressible as window
SQL — no packer state, no driver loop.

Scale design: a single global stream would mean one cumulative-sum
partition (serialized). Real pipelines pack per shard; here the shard
is md5-derived from the doc id (same key as operators/sampling, so the
DuckDB oracle replays it), giving ``n_shards`` independent streams that
each cumsum under a window partitioned by shard — one shuffle, bounded
per-task state, any cluster size. Output sequences are identified by
(shard, pack_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from electrician_spark.operators.sampling import sample_key


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document its position in the packed token stream.

    Adds: ``shard`` (md5-derived, stable), ``start_offset`` (tokens
    before this doc in its shard stream, ordered by ``id_col``),
    ``pack_id`` = floor(start_offset / budget), and ``n_splits`` — how
    many budget-sized packs the document touches (1 = fits without
    crossing a cut; oversized docs span many).

    Integer window cumsum — exact, no floating point, no Python.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    shard = (sample_key(F.col(id_col)) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.select("*", shard)
        .withColumn("start_offset", F.sum(token_col).over(w) - F.col(token_col))
        .withColumn("pack_id", F.floor(F.col("start_offset") / F.lit(budget)))
        .withColumn(
            "n_splits",
            F.floor((F.col("start_offset") + F.col(token_col) - 1) / F.lit(budget))
            - F.col("pack_id")
            + 1,
        )
    )
    return out
