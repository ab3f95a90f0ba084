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


def pack_best_fit(
    df: DataFrame,
    token_col: str,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Bin-pack documents into fixed-budget sequences WITHOUT splitting
    any document — the padding-minimizing layout next to
    :func:`pack_sequences`' concat-and-cut (which splits at the
    boundary). Best-Fit-Decreasing per shard: docs sorted by (tokens
    desc, id) go to the open pack with the least-but-sufficient
    remaining room; no fit opens a new pack. BFD is the classic 11/9
    OPT + 6/9 approximation — the practical standard for
    no-split sequence packing. Documents longer than ``budget`` get a
    pack of their own (flag downstream via ``tokens > budget``).

    Adds ``shard`` (md5-derived, stable) and ``pack_id`` (0-based per
    shard, creation order). Deterministic: same inputs → same packs on
    any cluster size/engine (md5 shard key, total sort order,
    deterministic tie-breaks).

    Scale design: the greedy loop is inherently sequential, so it runs
    per SHARD inside ``applyInPandas`` — ``n_shards`` independent
    bounded streams (pick n_shards so a shard's doc count fits a task;
    the md5 key balances them). Within a shard the open-pack search is
    a bisect over remaining capacities — O(docs·log packs) amortized.
    This mirrors production packers (e.g. ragged-batch builders):
    global order doesn't matter, per-stream determinism does."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    import bisect

    import pandas as pd

    out_fields = df.schema.fieldNames()
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["shard long", "pack_id long"]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        )
        # rem holds (remaining_capacity, pack_id) sorted ascending; the
        # best fit for size s is the first entry with remaining >= s.
        rem: list[tuple[int, int]] = []
        next_pack = 0
        assigned = []
        for size in pdf[token_col].fillna(0).astype("int64"):
            i = bisect.bisect_left(rem, (int(size), -1))
            if i < len(rem):
                r, pid = rem.pop(i)
                bisect.insort(rem, (r - int(size), pid))
                assigned.append(pid)
            else:
                assigned.append(next_pack)
                left = budget - int(size)
                if left > 0:
                    bisect.insort(rem, (left, next_pack))
                next_pack += 1
        pdf = pdf.copy()
        pdf["pack_id"] = pd.array(assigned, dtype="int64")
        return pdf

    keyed = df.withColumn("shard", (sample_key(F.col(id_col)) % n_shards).cast("long"))
    return keyed.groupBy("shard").applyInPandas(
        lambda pdf: _pack(pdf), schema
    ).select(*out_fields, "shard", "pack_id")


def packing_stats(
    packed: DataFrame, token_col: str, budget: int
) -> DataFrame:
    """Pack-level utilization for a :func:`pack_best_fit` /
    :func:`pack_sequences` result: one row per (shard, pack_id) with
    n_docs, used tokens and padding, plus the overall padding fraction
    attached via the pinned broadcast single-row bounds join. One
    map-side-combined groupBy — never a window."""
    per = packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"), F.sum(token_col).alias("used_tokens")
    )
    per = per.withColumn(
        "padding", F.greatest(F.lit(budget) - F.col("used_tokens"), F.lit(0))
    )
    totals = per.agg(
        F.sum("used_tokens").alias("__used"), F.sum("padding").alias("__pad")
    )
    return per.join(F.broadcast(totals)).select(
        "shard",
        "pack_id",
        "n_docs",
        "used_tokens",
        "padding",
        (F.col("__pad") / (F.col("__used") + F.col("__pad"))).alias("corpus_padding_frac"),
    )


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


def length_batches(
    df: DataFrame,
    batch_size: int,
    len_col: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Length-grouped batch assignment (dynamic batching): within each
    md5-derived shard, documents sort by (length DESC, md5 key, id)
    and window into fixed-size batches — so every batch holds
    similar-length sequences and the padding waste
    ``batch_size·max_len − Σ len`` stays small (the standard
    alternative to random batching for variable-length training, the
    'sortish' / length-grouped sampler every training framework
    ships).

    Adds ``shard``, ``batch_id`` (per shard, 0-based), ``pos`` (0-based
    slot within the batch). Deterministic in (corpus, seed,
    batch_size, n_shards): the md5 tiebreak makes equal-length order
    reproducible and seed-shuffleable without changing batch-length
    locality. Fully window-SQL replayable (an r9 oracle candidate).

    Scale: same posture as :func:`pack_sequences` — one hash exchange
    on the shard key, per-shard window sort; no global sort, no
    Python, bounded per-task state. Within-shard length locality
    equals global locality in expectation because shard assignment is
    length-independent (md5 of the id)."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from electrician_spark.operators.sampling import shuffle_key

    key = shuffle_key(F.col(id_col), seed)
    shard = (sample_key(F.col(id_col)) % n_shards).alias("shard")
    w = Window.partitionBy("shard").orderBy(
        F.col(len_col).desc(), key.asc(), F.col(id_col).asc()
    )
    rn = F.row_number().over(w) - 1
    return (
        df.select("*", shard)
        .withColumn("batch_id", F.floor(rn / F.lit(batch_size)))
        .withColumn("pos", rn % F.lit(batch_size))
    )


def length_batch_stats(batched: DataFrame, len_col: str) -> DataFrame:
    """Per-batch padding audit for :func:`length_batches` output:
    (shard, batch_id, n, max_len, sum_len, pad_frac) where ``pad_frac``
    = 1 − Σlen / (n·max_len) — the fraction of a padded batch tensor
    that is waste. One map-side-combined aggregation."""
    return (
        batched.groupBy("shard", "batch_id")
        .agg(
            F.count("*").alias("n"),
            F.max(len_col).alias("max_len"),
            F.sum(len_col).alias("sum_len"),
        )
        .withColumn(
            "pad_frac",
            F.round(
                1.0 - F.col("sum_len") / (F.col("n") * F.col("max_len")), 6
            ),
        )
    )
