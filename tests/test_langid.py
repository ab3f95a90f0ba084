"""Model-based language ID (operators/langid.py): the frozen-NB tier
must actually identify languages on a language-correlated corpus, its
dyadic scores must be exact integers that survive artifact round-trip
bit-for-bit, and the hashed-logistic tier must reach the same holdout
accuracy bar."""

from __future__ import annotations

import os
import random
import tempfile

from pyspark.sql import functions as F

from electrician_spark.operators import langid


_VOCAB = {
    "de": "und der das ist haus wasser nicht eine mit sich auch nach zeit".split(),
    "en": "the and with house water not from this have been what about time".split(),
    "fr": "le et avec maison eau pas une pour dans les vous nous tres temps".split(),
}


def _corpus(seed: int = 7, per_lang: int = 60):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, vocab in sorted(_VOCAB.items()):
        for _ in range(per_lang):
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(15, 35)))
            rows.append((i, lang, text))
            i += 1
    return rows


def _splits(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, lang string, text string")
    return df.filter(F.col("doc_id") % 5 != 0), df.filter(F.col("doc_id") % 5 == 0)


def _accuracy(pred_df, truth_df) -> float:
    j = pred_df.select("doc_id", "lang_pred").join(
        truth_df.select("doc_id", "lang"), "doc_id"
    )
    n = j.count()
    ok = j.filter(F.col("lang_pred") == F.col("lang")).count()
    return ok / n


def test_nb_langid_holdout_accuracy(spark):
    train, test = _splits(spark)
    model = langid.train_langid(train, max_grams=200)
    pred = langid.langid_scores(test, model)
    assert _accuracy(pred, test) >= 0.95


def test_nb_scores_are_exact_integers_with_positive_margin(spark):
    train, test = _splits(spark)
    model = langid.train_langid(train, max_grams=200)
    rows = langid.langid_scores(test, model).collect()
    assert rows, "no scored rows"
    for r in rows:
        assert isinstance(r["score_u"], int)
        assert isinstance(r["margin_u"], int)
        assert r["margin_u"] >= 0


def test_nb_artifact_roundtrip_is_bit_identical(spark):
    train, test = _splits(spark)
    model = langid.train_langid(train, max_grams=150)
    path = os.path.join(tempfile.mkdtemp(prefix="langid_"), "model.json")
    langid.save_langid(model, path)
    loaded = langid.load_langid(path)
    assert loaded == model
    a = sorted(map(tuple, langid.langid_scores(test, model).collect()))
    b = sorted(map(tuple, langid.langid_scores(test, loaded).collect()))
    assert a == b


def test_nb_model_is_bounded(spark):
    train, _ = _splits(spark)
    model = langid.train_langid(train, max_grams=50)
    assert model.k <= 50
    assert len(model.grams) == model.k * len(model.priors)


def test_char_ngrams_edges(spark):
    df = spark.createDataFrame(
        [(0, "ab"), (1, "a"), (2, ""), (3, None)], "i long, t string"
    )
    out = {
        r["i"]: r["g"]
        for r in df.select("i", langid.char_ngrams(F.col("t"), 2).alias("g")).collect()
    }
    assert out[0] == ["ab"]
    assert out[1] == []
    assert out[2] == []
    assert out[3] is None or out[3] == []


def test_ml_langid_holdout_accuracy(spark):
    train, test = _splits(spark)
    model = langid.train_langid_ml(train, n=3, hash_bits=14, max_iter=30)
    pred = langid.langid_ml_scores(test, model)
    assert _accuracy(pred, test) >= 0.95
    assert set(model.labels) == set(_VOCAB)


def test_train_rejects_null_labels_and_single_language(spark):
    import pytest

    base = spark.createDataFrame(
        [(0, "en", "the and with"), (1, "en", "house water the")],
        "doc_id long, lang string, text string",
    )
    with pytest.raises(ValueError, match="2 distinct languages"):
        langid.train_langid(base)
    with_null = base.union(
        spark.createDataFrame(
            [(2, None, "und der das")], "doc_id long, lang string, text string"
        )
    )
    with pytest.raises(ValueError, match="NULL labels"):
        langid.train_langid(with_null)


def test_langid_scoring_plan_is_broadcast_only(spark):
    """The corpus-scale scoring pass must never shuffle the corpus
    through a SortMergeJoin (model + priors are broadcast dimensions)
    and must stay off the row-Python path."""
    train, test = _splits(spark)
    model = langid.train_langid(train, max_grams=100)
    plan = (
        langid.langid_scores(test, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_langid_gate_carries_quality_signals_without_rejoin(spark):
    """The composed curation gate (q_x9 shape): quality signals named
    in ``carry`` ride the ONE scoring shuffle — the plan must show the
    broadcast model join and NO corpus-to-scores re-join (no
    SortMergeJoin anywhere, exactly the scoring aggregation's
    exchanges), and gate semantics must equal the manual filter."""
    train, test = _splits(spark)
    model = langid.train_langid(train, max_grams=100)
    enriched = test.withColumn("n_tokens", F.size(F.split(F.col("text"), r"\s+")))
    gated = langid.langid_gate(
        enriched, model, min_margin_u=1, carry=["n_tokens"]
    )
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    # semantics: same rows as scoring-then-filter, signals intact
    manual = (
        langid.langid_scores(test, model)
        .filter(F.col("margin_u") >= 1)
        .join(enriched.select("doc_id", "n_tokens"), "doc_id")
    )
    got = {(r["doc_id"], r["n_tokens"], r["lang_pred"]) for r in gated.collect()}
    want = {(r["doc_id"], r["n_tokens"], r["lang_pred"]) for r in manual.collect()}
    assert got == want and got


def test_load_langid_rejects_truncated_artifact(spark, tmp_path):
    """A hand-edited/truncated JSON artifact (missing grid entries)
    must error at load, not silently score missing entries as
    log-prob 0."""
    import json

    import pytest

    train, _ = _splits(spark)
    model = langid.train_langid(train, max_grams=50)
    p = str(tmp_path / "m.json")
    langid.save_langid(model, p)
    d = json.load(open(p))
    d["grams"] = d["grams"][:-1]  # drop one (gram, lang) entry
    json.dump(d, open(p, "w"))
    with pytest.raises(ValueError, match="grid is incomplete"):
        langid.load_langid(p)


def test_langid_scores_rejects_colliding_carry(spark):
    train, test = _splits(spark)
    model = langid.train_langid(train, max_grams=50)
    import pytest

    with pytest.raises(ValueError, match="collide"):
        langid.langid_scores(
            test.withColumn("gram", F.lit(1)), model, carry=["gram"]
        )
