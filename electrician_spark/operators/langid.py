"""Model-based language identification — the TRAINED tier of the
curation chain's first gate.

Every real pipeline runs language ID before anything else; the
heuristic tier (``functions/text.langid_scores`` — stopword/charset
rules, q_x3) is cheap but brittle, and production systems put a
trained classifier behind it (fastText lid.176, langid.py). This
module provides that tier twice, mirroring the quality-classifier
split in ``operators/classifier.py``:

- :func:`train_langid` / :func:`langid_scores`: multinomial Naive
  Bayes over character n-grams with an EXPLICIT, bounded,
  dyadic-quantized (gram, lang) -> weight table — the auditable,
  engine-portable "frozen linear scorer" deployment mode
  (classifier.linear_scores' contract, lifted to multiclass). NB over
  char n-grams is the classic model-based lang-ID (langid.py); its
  document score is LINEAR in gram counts, so the frozen table IS a
  linear model. Log-probabilities snap to the 2^-quant_bits dyadic
  grid (the q_ug1/unigram-tokenizer recipe, tokenizer.quantize_logprobs)
  and ship as INTEGER multiples of 2^-bits, so every document score is
  an exact integer sum — bit-identical across engines, summation
  orders, and partitionings, which is what lets a DuckDB oracle replay
  train AND score end-to-end (q_li1).
- :func:`train_langid_ml`: the hashed-char-ngram logistic tier —
  ``pyspark.ml`` HashingTF + multinomial LogisticRegression, the same
  machinery as ``classifier.train_quality_classifier`` with char
  n-grams in place of word features. Higher capacity, not
  oracle-replayable (murmur3 feature hashing has no DuckDB
  counterpart); accuracy is test-pinned on a crafted multi-language
  corpus.

Scale shape (100 TB): training aggregates gram counts with map-side
combine (bounded at |grams| x |langs| after the top-K cut); the model
is a dimension table (<= max_grams x n_langs + n_langs rows) collected
once, persisted as JSON, and broadcast for scoring. Scoring is one
corpus scan: explode grams -> broadcast hash join on the model ->
one groupBy(doc) partial-aggregated shuffle -> argmax window per doc.
No Python in either path.

Reference parity: the reference engine has no model stage (SURVEY
§2.4); this module is part of the mandated LLM-pipeline extension
surface, alongside operators/classifier.py.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def char_ngrams(text: Column, n: int = 2) -> Column:
    """Character n-grams of lowercased text (spaces included — word
    boundaries carry language signal), as one Column expression.
    Empty / too-short text yields an empty array."""
    s = F.lower(text)
    cnt = F.length(s) - (n - 1)
    return F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), cnt), lambda i: F.substring(s, i, F.lit(n))
        ),
    ).otherwise(F.array().cast("array<string>"))


@dataclass(frozen=True)
class LangIdModel:
    """Frozen multinomial-NB language model: explicit dyadic weight
    table. ``grams`` maps (gram, lang) -> integer log-prob in units of
    2^-quant_bits; ``priors`` maps lang -> integer log-prior in the
    same units. Bounded by construction: len(grams) <= k * n_langs."""

    n: int
    alpha: float
    quant_bits: int
    k: int
    grams: tuple[tuple[str, str, int], ...]
    priors: tuple[tuple[str, int], ...]


def train_langid(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 2,
    alpha: float = 0.5,
    max_grams: int = 300,
    quant_bits: int = 20,
) -> LangIdModel:
    """Train the frozen-NB language model on a labeled corpus.

    P(gram|lang) = (c + alpha) / (n_lang + alpha*K) over the K grams
    kept by global frequency (count desc, gram asc — deterministic);
    priors from document counts. Weights = floor(ln(p)*2^bits + 0.5)
    (floor+0.5, not round(): identical semantics in every engine — no
    half-even/half-up divergence). ``alpha`` should be dyadic (0.5,
    0.25, ...) so the ln argument is an exactly-representable
    rational on every engine.

    All heavy work is distributed aggregation with map-side combine;
    the only driver materialization is the model itself — bounded at
    K*n_langs + n_langs rows by construction."""
    q = float(1 << quant_bits)
    grams = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy("gram", "lang").agg(F.count("*").alias("c"))
    top = (
        counts.groupBy("gram")
        .agg(F.sum("c").alias("ct"))
        .orderBy(F.col("ct").desc(), "gram")
        .limit(max_grams)
        .select("gram")
    )
    langs = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count("*").alias("nd")
    )
    # Bounded cross join: <= max_grams x n_langs rows — completes the
    # grid so a gram unseen in some language still gets its alpha
    # floor (that asymmetry IS the signal).
    grid = top.crossJoin(F.broadcast(langs.select("lang")))
    full = (
        grid.join(counts, ["gram", "lang"], "left")
        .fillna(0, subset=["c"])
        .localCheckpoint(eager=False)
    )
    k = full.select("gram").distinct().count()
    n_l = full.groupBy("lang").agg(F.sum("c").alias("n_l"))
    lp = F.floor(
        F.log((F.col("c") + F.lit(alpha)) / (F.col("n_l") + F.lit(alpha) * k))
        * q
        + F.lit(0.5)
    ).cast("long")
    gram_rows = [
        (r["gram"], r["lang"], r["lp"])
        for r in full.join(n_l, "lang").select("gram", "lang", lp.alias("lp")).collect()
    ]
    total = docs.count()
    pp = F.floor(F.log(F.col("nd") / F.lit(float(total))) * q + F.lit(0.5)).cast(
        "long"
    )
    prior_rows = [
        (r["lang"], r["pp"]) for r in langs.select("lang", pp.alias("pp")).collect()
    ]
    return LangIdModel(
        n=n,
        alpha=alpha,
        quant_bits=quant_bits,
        k=k,
        grams=tuple(sorted(gram_rows)),
        priors=tuple(sorted(prior_rows)),
    )


def langid_scores(
    docs: DataFrame,
    model: LangIdModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, lang_pred, score_u, margin_u): argmax language per
    document under the frozen model, with EXACT integer scores
    (units of 2^-quant_bits: score_u = prior + sum of in-model gram
    weights; out-of-model grams are skipped — the model's event space
    is its K kept grams). margin_u = top score minus runner-up: the
    confidence gate a curation pipeline thresholds on. Ties break to
    the lexicographically-first language — and because scores are
    exact integers, ties are identical on every engine.

    One corpus scan: explode -> broadcast join on the model table ->
    partial-aggregated groupBy(doc, lang) -> per-doc argmax window
    (bounded at n_langs rows per document)."""
    spark = docs.sparkSession
    mdf = spark.createDataFrame(
        list(model.grams), "gram string, lang string, lp long"
    )
    pdf = spark.createDataFrame(list(model.priors), "lang string, pp long")
    g = docs.select(
        F.col(id_col), F.explode(char_ngrams(F.col(text_col), model.n)).alias("gram")
    )
    hits = (
        g.join(F.broadcast(mdf), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum("lp").alias("s"))
    )
    base = docs.select(id_col).crossJoin(F.broadcast(pdf))
    sc = (
        base.join(hits, [id_col, "lang"], "left")
        .fillna(0, subset=["s"])
        .withColumn("score", F.col("pp") + F.col("s"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), "lang")
    ranked = sc.select(
        F.col(id_col),
        F.col("lang").alias("lang_pred"),
        "score",
        F.row_number().over(w).alias("_rn"),
        F.lead("score").over(w).alias("_s2"),
    )
    return ranked.filter(F.col("_rn") == 1).select(
        id_col,
        "lang_pred",
        F.col("score").alias("score_u"),
        (F.col("score") - F.col("_s2")).alias("margin_u"),
    )


def save_langid(model: LangIdModel, path: str) -> None:
    """Persist the frozen model as a JSON artifact — the auditable,
    engine-portable shipping form (the point of the explicit table)."""
    with open(path, "w") as fh:
        json.dump(
            {
                "n": model.n,
                "alpha": model.alpha,
                "quant_bits": model.quant_bits,
                "k": model.k,
                "grams": [list(g) for g in model.grams],
                "priors": [list(p) for p in model.priors],
            },
            fh,
        )


def load_langid(path: str) -> LangIdModel:
    with open(path) as fh:
        d = json.load(fh)
    return LangIdModel(
        n=d["n"],
        alpha=d["alpha"],
        quant_bits=d["quant_bits"],
        k=d["k"],
        grams=tuple((g[0], g[1], int(g[2])) for g in d["grams"]),
        priors=tuple((p[0], int(p[1])) for p in d["priors"]),
    )


def train_langid_ml(
    labeled: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    hash_bits: int = 18,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """The hashed-ngram logistic tier: HashingTF over char n-grams +
    multinomial LogisticRegression — classifier.train_quality_classifier's
    machinery with char features and a multiclass head (fastText-style
    capacity; murmur3 hashing means no vocabulary to build or
    broadcast). Returns a fitted PipelineModel whose ``prediction``
    column indexes ``labels`` (the StringIndexer order). Not
    oracle-replayable (no murmur3 in SQL engines); accuracy is
    test-pinned. Persist with model.write().overwrite().save(path)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, StringIndexer

    if not 8 <= hash_bits <= 24:
        raise ValueError(f"hash_bits must be in [8, 24], got {hash_bits}")
    # The label indexer is fit-time-only (scoring inputs carry no
    # language column), so it lives OUTSIDE the inference pipeline.
    idx = StringIndexer(
        inputCol=lang_col, outputCol="_label", stringOrderType="alphabetAsc"
    ).fit(labeled)
    feat = idx.transform(labeled).withColumn(
        "_ftoks", char_ngrams(F.col(text_col), n)
    )
    pipe = Pipeline(
        stages=[
            HashingTF(
                inputCol="_ftoks", outputCol="features", numFeatures=1 << hash_bits
            ),
            LogisticRegression(
                featuresCol="features",
                labelCol="_label",
                maxIter=max_iter,
                regParam=reg_param,
                family="multinomial",
            ),
        ]
    )
    return MlLangIdModel(
        pipeline=pipe.fit(feat), labels=tuple(idx.labels), n=n
    )


@dataclass(frozen=True)
class MlLangIdModel:
    """Fitted hashed-logistic lang-ID: inference pipeline + the label
    order the prediction indexes + the char n-gram width used at fit."""

    pipeline: object
    labels: tuple[str, ...]
    n: int


def langid_ml_scores(
    df: DataFrame,
    model: MlLangIdModel,
    text_col: str = "text",
    out_col: str = "lang_pred",
) -> DataFrame:
    """Append ``out_col``: the predicted language string under a
    :func:`train_langid_ml` model (broadcast model, one scan)."""
    feat = df.withColumn("_ftoks", char_ngrams(F.col(text_col), model.n))
    scored = model.pipeline.transform(feat)
    lab = F.array(*[F.lit(x) for x in model.labels])
    return scored.withColumn(
        out_col, F.element_at(lab, F.col("prediction").cast("int") + 1)
    ).drop("_ftoks", "features", "rawPrediction", "probability", "prediction")
