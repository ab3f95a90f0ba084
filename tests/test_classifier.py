"""Model-based quality classifier: separability on a synthetic corpus,
scoring determinism from a fixed model, save/load artifact round-trip,
filter composition, and the no-shuffle scoring plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from electrician_spark.operators import classifier as qc


def _labeled_corpus(spark, n=120):
    # "quality": natural sentences with stopwords; "spam": repeated
    # keyword-stuffed fragments — linearly separable by token features.
    good = [
        (i, 1.0,
         f"The quick study number {i} shows that careful writing has "
         f"structure and the sentences flow with meaning and variety.")
        for i in range(n)
    ]
    bad = [
        (1000 + i, 0.0,
         f"buy cheap buy cheap winner {i} click click casino casino "
         "free free free prize prize")
        for i in range(n)
    ]
    return spark.createDataFrame(good + bad, "doc_id long, label double, text string")


def test_classifier_separates_and_filters(spark):
    labeled = _labeled_corpus(spark)
    model = qc.train_quality_classifier(labeled, max_iter=30)
    scored = qc.quality_scores(labeled, model)
    rows = scored.select("doc_id", "label", "quality_score").collect()
    good = [r.quality_score for r in rows if r.label == 1.0]
    bad = [r.quality_score for r in rows if r.label == 0.0]
    assert min(good) > 0.9 and max(bad) < 0.1  # clean separation
    # unseen documents from each distribution score on the right side
    unseen = spark.createDataFrame(
        [
            (1, "The detailed report shows that the methods have structure and meaning."),
            (2, "click casino winner free free prize click cheap"),
        ],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.quality_score for r in qc.quality_scores(unseen, model).collect()}
    assert s[1] > 0.5 > s[2]
    kept = {r.doc_id for r in qc.quality_filter(unseen, model, threshold=0.5).collect()}
    assert kept == {1}
    # input columns pass through unchanged
    assert set(qc.quality_scores(unseen, model).columns) == {"doc_id", "text", "quality_score"}


def test_classifier_artifact_roundtrip_and_determinism(spark, tmp_path):
    from pyspark.ml import PipelineModel

    labeled = _labeled_corpus(spark, n=60)
    model = qc.train_quality_classifier(labeled, max_iter=20)
    path = str(tmp_path / "quality_model")
    model.write().overwrite().save(path)
    back = PipelineModel.load(path)
    probe = labeled.select("doc_id", "text")
    a = {r.doc_id: r.quality_score for r in qc.quality_scores(probe, model).collect()}
    b = {r.doc_id: r.quality_score for r in qc.quality_scores(probe, back).collect()}
    assert a == b  # the saved artifact IS the reproducibility unit
    again = {r.doc_id: r.quality_score for r in qc.quality_scores(probe, back).collect()}
    assert again == b  # scoring a fixed model is deterministic


def test_scoring_plan_is_single_scan_no_shuffle(spark):
    labeled = _labeled_corpus(spark, n=40)
    model = qc.train_quality_classifier(labeled, max_iter=10)
    scored = qc.quality_scores(labeled.select("doc_id", "text"), model)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p  # scoring never shuffles
    assert "BatchEvalPython" not in p  # JVM-side hashing + dot product


def test_train_validates_hash_bits(spark):
    import pytest

    labeled = _labeled_corpus(spark, n=5)
    with pytest.raises(ValueError):
        qc.train_quality_classifier(labeled, hash_bits=4)
