"""Model-based quality classification — the fastText-style linear
scorer used by modern data-curation pipelines (DCLM, FineWeb-Edu,
LLaMA's "quality classifier" stage) between heuristic batteries
(Gopher/C4 rules) and LM-perplexity buckets: train a linear model on
labeled good/bad examples, score the whole corpus, keep the top mass.

Spark-first design:
- **Features** are hashed bags of lowercased tokens + word bigrams
  (``HashingTF`` — murmur3 feature hashing, the exact fastText trick:
  no vocabulary to build, broadcast, or version; dimensionality is a
  constant knob). One codegen'd projection feeds the hasher; no
  Python.
- **Training** is ``pyspark.ml`` LogisticRegression: distributed
  L-BFGS over treeAggregated gradients — linear scans of the labeled
  set, driver state = one coefficient vector (``2^hash_bits`` floats,
  the bounded-model contract shared with k-means/PQ/LM tables).
  Labeled sets are small next to the corpus (human/LLM-annotated), so
  at 100 TB training cost is noise; SCORING is the corpus-scale pass.
- **Scoring** broadcasts the fitted model into executor-side vector
  ops (one sparse dot product per document) — one corpus scan, no
  shuffle, no Python. ``quality_filter`` composes score + threshold.

Determinism: feature hashing is deterministic; L-BFGS over float
aggregation is deterministic up to float summation order —
coefficients can differ in final ulps between cluster layouts, so
model artifacts (not training runs) are the reproducibility unit:
persist with ``model.save`` and score everywhere from the SAME saved
model, exactly like shipping fastText .bin files.

Reference parity: the reference engine has no model stage (its closest
analog is the sentiment-tagging transformer example,
/root/reference/example/conduit_example/chain/main.go); this module is
part of the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from electrician_spark.functions.text import tokens


def _feature_tokens(text: Column) -> Column:
    """Lowercased unigrams + space-joined word bigrams — the fastText
    wordNgrams=2 feature set, as one pure Column expression."""
    toks = tokens(F.lower(text))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    hash_bits: int = 18,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """Fit the fastText-style quality model on a labeled sample
    (``label_col``: 1.0 = keep-quality, 0.0 = reject). Returns a fitted
    ``pyspark.ml`` PipelineModel (hasher + logistic regression);
    persist it with ``model.write().overwrite().save(path)`` and score
    corpora from the saved artifact.

    The labeled set is assumed human-scale (10k-1M rows); training is
    max_iter linear passes with a 2^hash_bits-float driver state."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    if not 8 <= hash_bits <= 24:
        raise ValueError(f"hash_bits must be in [8, 24], got {hash_bits}")
    feat = labeled.select(
        F.col(label_col).cast("double").alias("label"),
        _feature_tokens(F.col(text_col)).alias("_ftoks"),
    )
    pipeline = Pipeline(
        stages=[
            HashingTF(
                inputCol="_ftoks", outputCol="features", numFeatures=1 << hash_bits
            ),
            LogisticRegression(
                maxIter=max_iter, regParam=reg_param, standardization=False
            ),
        ]
    )
    return pipeline.fit(feat)


def quality_scores(
    df: DataFrame,
    model,
    text_col: str = "text",
    score_col: str = "quality_score",
) -> DataFrame:
    """Append ``score_col`` = P(quality=1) under a fitted
    :func:`train_quality_classifier` model. The model broadcasts; the
    corpus is scanned once (hash + sparse dot product per row, JVM-
    side), no shuffle. Input columns pass through unchanged."""
    feat = df.withColumn("_ftoks", _feature_tokens(F.col(text_col)))
    scored = model.transform(feat)
    # probability is a 2-vector [P(0), P(1)]
    from pyspark.ml.functions import vector_to_array

    return scored.withColumn(
        score_col, F.round(vector_to_array(F.col("probability"))[1], 6)
    ).drop("_ftoks", "features", "rawPrediction", "probability", "prediction")


def quality_filter(
    df: DataFrame,
    model,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents scoring ≥ ``threshold`` under the model — the
    corpus-curation cut. One scan, pure filter on the scored column."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    scored = quality_scores(df, model, text_col=text_col)
    return scored.filter(F.col("quality_score") >= threshold)


def linear_scores(
    df: DataFrame,
    weights: dict[str, float],
    bias: float = 0.0,
    text_col: str = "text",
    score_col: str = "quality_z",
    keep_col: str = "quality_keep",
) -> DataFrame:
    """Frozen-coefficient linear text scorer — the DEPLOYMENT mode of a
    quality classifier: an explicit (token → weight) table (a distilled
    / pruned / hand-audited model, the interpretable sibling of the
    hashed fastText pipeline above), scored as
    ``z = bias + Σ weight(token)`` over token MULTIPLICITY, with
    ``keep = z > 0``. Shipping the weight table instead of a model
    binary is what makes the cut auditable and engine-portable — the
    exact property a 100 TB curation run wants when two systems must
    agree on which documents survive.

    Plan shape: the weight table folds into a literal map and the score
    is one per-row ``aggregate`` over the token array — zero shuffle,
    zero Python, rides the corpus scan. The fold runs interpreted (the
    documented HOF trade); the weight table is human-scale by contract
    (hundreds of tokens), so per-row cost is ~|tokens| map probes. For
    models past ~10³ tokens, switch to explode → broadcast-join →
    groupBy(doc) — one bounded shuffle, full codegen.

    Determinism contract: pass dyadic-rational weights (multiples of
    2^-k) and every score is EXACT in float64 regardless of summation
    order — the keep/drop decision cannot flip between engines or
    partitionings."""
    if not weights:
        raise ValueError("weights must be non-empty")
    m = F.create_map(
        *[
            x
            for tok, wt in sorted(weights.items())
            for x in (F.lit(tok), F.lit(float(wt)))
        ]
    )
    toks = tokens(F.lower(F.col(text_col)))
    z = F.aggregate(
        toks,
        F.lit(float(bias)),
        lambda acc, t: acc + F.coalesce(m[t], F.lit(0.0)),
    )
    return df.withColumn(score_col, z).withColumn(
        keep_col, F.col(score_col) > 0.0
    )
