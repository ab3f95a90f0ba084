"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169).

Selects raw-corpus documents that "look like" a small target corpus:
fit two bag-of-hashed-ngrams unigram models (target and raw), score
every raw document with the importance log-weight

    log w(x) = Σ_g  [ log p_target(bucket(g)) − log p_raw(bucket(g)) ]

over the document's unigram+bigram features g (with multiplicity), then
resample k documents with probability ∝ w(x) via deterministic
Gumbel top-k. The feature hash keeps both models bounded at
``n_buckets`` rows regardless of corpus size.

Reference parity: the reference engine has no data-selection stage —
this belongs to the LLM-training-data battery alongside the dedup /
sampling / quality-scoring operators (SURVEY §6).

Spark-first design — every stage is Column expressions, no Python:

- featurize: lower/trim/split + unigram and bigram grams, md5-hashed
  into ``n_buckets`` (``conv(substr(md5(g),1,8),16,10) % B`` — the
  repo-wide portable key, replayable in DuckDB as
  ``CAST('0x'||substr(md5(g),1,8) AS BIGINT) % B``). One explode →
  (doc, bucket) rows with multiplicity.
- fit: groupBy(bucket).count() — map-side combinable; output ≤ B rows.
- score: broadcast-join the (bucket → log-likelihood-ratio) table
  (≤ B rows by construction) against the exploded raw features, then
  one map-side-combinable groupBy(doc).sum().
- resample: Gumbel keys from md5-derived uniforms (the
  ``sampling.shuffle_key`` convention) + ``top_k`` —
  TakeOrderedAndProject, never a global sort.

100 TB posture: one linear scan to fit each model, one linear scan to
score (the raw-model fit and the scoring explode share the same gram
table — pass the same DataFrame and Spark reuses the stage under AQE),
one bounded broadcast (B ≤ a few hundred thousand rows ≪ executor
memory), and two scalar totals on the driver (bounded by contract).
No all-pairs stage anywhere.

Determinism: per-bucket log-ratios are float64; per-document sums are
rounded to 6 dp at the API edge (the repo-wide cross-engine float
contract — summation-order drift is ~1e-12 at document scale, far
below the rounding quantum).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from electrician_spark.operators.relational import top_k
from electrician_spark.operators.sampling import shuffle_key


def _lower_tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens, empties dropped (so leading /
    trailing / repeated whitespace never yields '' grams)."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit("")
    )


def gram_buckets(toks: Column, n_buckets: int) -> Column:
    """Array of hashed feature buckets (unigrams + bigrams, WITH
    multiplicity — a bag, not a set: dedup here would make weights
    insensitive to repetition, which the DSIR estimator is not).

    ``toks`` must be an attribute reference (pre-projected token
    array) — see :func:`electrician_spark.functions.text.
    shingles_from_tokens` for why inlining the split is O(len²)."""
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i.cast("int")), F.element_at(toks, (i + 1).cast("int"))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ),
    )


def _bucket_table(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """Exploded (``_id``, ``bucket``) feature rows, with multiplicity."""
    t = df.select(
        F.col(id_col).alias("_id"), _lower_tokens(F.col(text_col)).alias("_tk")
    )
    return t.select(
        "_id", F.explode(gram_buckets(F.col("_tk"), n_buckets)).alias("bucket")
    )


def fit_hashed_ngram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
) -> DataFrame:
    """Hashed-ngram model counts: (bucket, cnt), ≤ ``n_buckets`` rows.
    One linear scan, map-side-combinable groupBy."""
    return (
        _bucket_table(df, id_col, text_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def log_ratio_table(
    target_counts: DataFrame, raw_counts: DataFrame, n_buckets: int
) -> tuple[DataFrame, float]:
    """Per-bucket importance log-ratio under add-one smoothing:

        llr(b) = ln((ct_b + 1) / (T_t + B)) − ln((cr_b + 1) / (T_r + B))

    Returns ``(llr_df, default_llr)`` where ``default_llr`` is the
    ratio for a bucket absent from BOTH models (ct = cr = 0) — scoring
    a corpus other than the raw-model fit corpus can hit such buckets.

    The two totals are collected to the driver — two scalars, bounded
    by contract (same posture as the domain-census collects)."""
    t_total = target_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    r_total = raw_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    lt, lr = math.log(t_total + n_buckets), math.log(r_total + n_buckets)
    llr = (
        target_counts.select("bucket", F.col("cnt").alias("_ct"))
        .join(
            raw_counts.select("bucket", F.col("cnt").alias("_cr")),
            "bucket",
            "full_outer",
        )
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("_ct"), F.lit(0)) + 1)
                - F.lit(lt)
                - F.log(F.coalesce(F.col("_cr"), F.lit(0)) + 1)
                + F.lit(lr)
            ).alias("llr"),
        )
    )
    return llr, lr - lt


def dsir_log_weights(
    df: DataFrame,
    llr_df: DataFrame,
    default_llr: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
) -> DataFrame:
    """Per-document importance log-weight: (id, log_w, n_grams).

    Explode the document's feature buckets, broadcast-join the
    log-ratio table, sum per document (map-side combinable). ``log_w``
    is rounded to 6 dp (cross-engine float contract); ``n_grams`` is
    the feature count. 0-gram documents (empty/whitespace-only text)
    score ``log_w = 0.0`` with ``n_grams = 0`` — every input id
    appears in the output exactly once. They ride the SAME scan via
    ``explode_outer`` (empty gram arrays keep one NULL-bucket row), so
    restoring them costs zero extra joins/shuffles — a corpus-wide
    left join back onto the ids would be two avoidable exchanges at
    100 TB."""
    t = df.select(
        F.col(id_col).alias("_id"), _lower_tokens(F.col(text_col)).alias("_tk")
    )
    grams = t.select(
        "_id", F.explode_outer(gram_buckets(F.col("_tk"), n_buckets)).alias("bucket")
    )
    scored = grams.join(F.broadcast(llr_df), "bucket", "left")
    return (
        scored.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("bucket").isNull(), F.lit(0.0)).otherwise(
                        F.coalesce(F.col("llr"), F.lit(default_llr))
                    )
                ),
                6,
            ).alias("log_w"),
            F.count("bucket").alias("n_grams"),
        )
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    seed: int = 0,
) -> DataFrame:
    """End-to-end DSIR: fit both models, score ``raw_df``, Gumbel
    top-k resample. Returns (id, log_w, gumbel_key) for the k selected
    documents, highest key first.

    Gumbel trick: adding independent Gumbel(0,1) noise to each log
    weight and taking the arg-top-k draws k documents without
    replacement with probability ∝ w(x). The noise is deterministic —
    ``u = (shuffle_key(seed:id) + 0.5) / 2^32``, ``g = −ln(−ln u)`` —
    so the same corpus + seed selects the same documents on any
    cluster size or engine (the +0.5 keeps u strictly inside (0,1)).
    ``top_k`` compiles to TakeOrderedAndProject: per-partition heads
    only, no global sort."""
    target_counts = fit_hashed_ngram_counts(target_df, id_col, text_col, n_buckets)
    raw_counts = fit_hashed_ngram_counts(raw_df, id_col, text_col, n_buckets)
    llr, default_llr = log_ratio_table(target_counts, raw_counts, n_buckets)
    weights = dsir_log_weights(
        raw_df, llr, default_llr, id_col, text_col, n_buckets
    )
    u = (shuffle_key(F.col(id_col), seed) + F.lit(0.5)) / F.lit(float(1 << 32))
    gumbel = -F.log(-F.log(u))
    keyed = weights.select(
        id_col,
        "log_w",
        F.round(F.col("log_w") + gumbel, 6).alias("gumbel_key"),
    )
    return top_k(keyed, [F.col("gumbel_key").desc(), F.col(id_col)], k)
