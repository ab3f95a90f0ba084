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


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-budget chunks — the
    inverse layout op of :func:`pack_sequences` (packing merges short
    docs into sequences; chunking cuts long docs down to them), and the
    standard context-window prep for RAG indexing / long-doc training.

    Sliding-window rule: chunk starts at token 1, then every
    ``stride = max_tokens − overlap`` tokens, for starts ≤
    ``max(n − overlap, 1)`` — so the final chunk always reaches the
    document's last token, a tail shorter than ``overlap`` never
    spawns a fully-contained duplicate chunk, and ``overlap=0``
    partitions exactly. Zero-token documents produce zero chunks.

    Output: one row per chunk — (*input columns*, ``chunk_id`` (0-based
    per doc), ``n_chunks``, ``chunk_tokens``, ``chunk_text``).

    Scale: pure JVM — tokenize once per row, build the start list with
    ``sequence``, cut with ``slice`` inside a ``transform``, then ONE
    explode. No shuffle, no Python, no per-chunk re-tokenization;
    output size is the chunk count, input is scanned once."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"overlap must be in [0, max_tokens), got {overlap}")
    from electrician_spark.functions.text import tokens

    stride = max_tokens - overlap
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    # Bind the token array once (same one-element-transform trick as
    # text.shingles) so tokenize doesn't re-run per chunk element.
    bound = F.element_at(
        F.transform(F.array(toks), lambda tk: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tk) - overlap, F.lit(1)), F.lit(stride)),
            lambda s: F.slice(tk, s, max_tokens),
        )),
        1,
    )
    # posexplode_OUTER: the non-outer Generate makes Catalyst infer a
    # size(__chunks)>0 filter below the Project, which re-evaluates the
    # whole (interpreted) tokenize+chunk expression a second time per
    # row. __chunks is never empty by construction (start list always
    # holds 1), so outer semantics are identical here — minus the
    # duplicated evaluation.
    exploded = df.withColumn("__chunks", bound).select(
        "*", F.posexplode_outer("__chunks").alias("chunk_id", "__chunk")
    )
    return (
        exploded.withColumn("n_chunks", F.size("__chunks"))
        .withColumn("chunk_tokens", F.size("__chunk"))
        .withColumn("chunk_text", F.concat_ws(" ", "__chunk"))
        # zero-token docs produce one empty chunk row — drop it HERE,
        # on the generated column: a pre-explode filter on __chunks[0]
        # gets pushed below the Project and re-evaluates the whole
        # (interpreted) tokenize+chunk expression a second time per row.
        .filter(F.col("chunk_tokens") > 0)
        .drop("__chunks", "__chunk")
    )
