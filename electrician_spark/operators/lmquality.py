"""LM-perplexity quality scoring (CCNet-style head/middle/tail buckets).

Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") scores each document with a language
model trained on a trusted reference corpus (Wikipedia) and buckets the
corpus by perplexity quantiles — the standard model-based quality
stage between heuristic filters (Gopher rules) and dedup. CCNet uses a
KenLM 5-gram; this implementation is the dependency-free add-α
**unigram** variant with a principled OOV mass, which preserves the
head/middle/tail *ranking* structure the buckets need (doc-level mean
token log-prob is dominated by vocabulary choice at unigram order).
A KenLM upgrade is a drop-in pandas-UDF swap of ``lm_score``.

Scale design:
- ``unigram_lm``: ONE distributed pass over the reference corpus
  (explode → map-side-combined groupBy from text.token_frequency_table)
  reduced to a ``vocab_size``-row model table — model size is bounded
  by vocabulary, never by corpus.
- ``lm_score``: the model table **broadcasts** (≤ a few hundred
  thousand rows); scoring is explode → broadcast hash join → one
  groupBy on doc id. One corpus scan, one shuffle, zero Python.
- ``perplexity_buckets``: thresholds from ``approxQuantile`` (driver
  gets ``n_buckets-1`` floats), applied as a codegen'd CASE — no sort,
  no second shuffle.

Everything is exact given the vocabulary cutoff and deterministic
(count-then-token ordering breaks frequency ties), so a plain-Python
reference reproduces scores bit-for-bit in tests.

Reference parity: the reference engine has no model-based scoring
(closest analog is its sentiment-tagging transformer example,
/root/reference/example/conduit_example/chain/main.go); this module is
part of the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from electrician_spark.functions.text import tokens


def _lm_tokens(text):
    """LM tokenization: lowercase + whitespace split (the model and the
    scorer must agree — both call this)."""
    return tokens(F.lower(text))


def unigram_lm(
    ref_df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 100_000,
    alpha: float = 0.1,
) -> DataFrame:
    """Train an add-α-smoothed unigram LM on a reference corpus.

    Returns a (token, logprob) DataFrame of the ``vocab_size`` most
    frequent tokens, count-then-token ordered for determinism, plus the
    metadata needed to score OOV tokens carried as literal columns
    (``oov_logprob`` — identical on every row, so the scorer can read
    it from ``first()`` of the broadcast side without a second pass).

    Smoothing: P(t) = (c_t + α) / (N + α·(V+1)) where V counts the
    kept vocabulary and the +1 is the single OOV class receiving
    P(oov) = α / (N + α·(V+1)). Tokens truncated by ``vocab_size``
    fold into the OOV class (their mass is *not* redistributed — the
    cutoff is part of the model, exactly like a tokenizer vocab).

    The bounded model is MATERIALIZED (collect ≤ vocab_size count rows
    → one local DataFrame): the reference corpus is scanned exactly
    once, no matter how many downstream actions consume the model —
    an uncached lineage would re-run the corpus aggregation per action
    (scoring join, oov fetch, every test assertion)."""
    count_rows = (
        ref_df.select(F.explode(_lm_tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("token"))
        .limit(vocab_size)
        .collect()  # ≤ vocab_size rows — bounded driver fetch, ONE scan
    )
    n = sum(int(r["c"]) for r in count_rows)
    v = len(count_rows)
    denom = n + alpha * (v + 1)
    oov_logprob = math.log(alpha / denom)
    model = [
        (r["token"], math.log((int(r["c"]) + alpha) / denom), oov_logprob)
        for r in count_rows
    ]
    return ref_df.sparkSession.createDataFrame(
        model, "token string, logprob double, oov_logprob double"
    )


def lm_score(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean token log-prob and perplexity under ``lm``.

    Plan: explode tokens → **broadcast** left join on the model table
    (OOV rows take the model's ``oov_logprob``) → one groupBy on the
    doc id. Documents with zero tokens score NULL (no fabricated
    perplexity). Output: (id_col, n_tokens, mean_logprob, perplexity),
    perplexity = exp(−mean_logprob)."""
    toks = (
        df.select(F.col(id_col), F.explode(_lm_tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    joined = toks.join(F.broadcast(lm.select("token", "logprob")), "token", "left")
    # oov_logprob is constant on the model side: reduce it to ONE row
    # and attach it with a broadcast single-row bounds join (same
    # pinned pattern as quantize.py) so unmatched token rows get it.
    oov_row = lm.agg(F.first("oov_logprob", ignorenulls=True).alias("__oov"))
    scored = joined.join(F.broadcast(oov_row)).select(
        F.col(id_col),
        F.coalesce(F.col("logprob"), F.col("__oov")).alias("lp"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("lp").alias("mean_logprob"),
        )
        .select(
            id_col,
            "n_tokens",
            "mean_logprob",
            F.exp(-F.col("mean_logprob")).alias("perplexity"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    relative_error: float = 0.001,
) -> DataFrame:
    """Assign CCNet-style quantile buckets on ``perplexity`` (lower =
    closer to the reference distribution = ``head``). Thresholds come
    from ``approxQuantile`` (driver receives n_buckets−1 floats; the
    error knob trades a second pass for precision); assignment is a
    codegen'd CASE chain — no global sort. ``labels`` must have
    ``n_buckets`` entries."""
    if len(labels) != n_buckets:
        raise ValueError(f"need {n_buckets} labels, got {len(labels)}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scored.approxQuantile("perplexity", qs, relative_error)
    expr = F.lit(labels[-1])
    for cut, label in zip(reversed(cuts), reversed(labels[:-1])):
        expr = F.when(F.col("perplexity") <= cut, F.lit(label)).otherwise(expr)
    return scored.withColumn("bucket", expr)
