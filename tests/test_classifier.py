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


def test_linear_scores_matches_python_replay(spark):
    """Frozen-coefficient scorer: z = bias + Σ weight(token) over token
    MULTIPLICITY, keep = z > 0 — vs a plain-Python fold. Dyadic weights
    make the float sums exact, so equality is bitwise, not approximate."""
    w = {"good": 0.5, "bad": -0.75, "the": -0.015625}
    rows = [
        (1, "good good the story"),   # 0.5+0.5-0.015625-1 = -0.015625
        (2, "GOOD Bad good"),          # case-folded: 0.5-0.75+0.5-1+... 
        (3, "neutral words only"),
        (4, "good good good good"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.quality_z, r.quality_keep) for r in
           qc.linear_scores(df, w, bias=-1.0).collect()}
    for did, text in rows:
        z = -1.0 + sum(w.get(t, 0.0) for t in text.lower().split())
        assert got[did] == (z, z > 0), (did, got[did], z)
    assert got[4][1] is True and got[3][1] is False


def test_linear_scores_zero_shuffle_no_python(spark):
    import contextlib
    import io

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    scored = qc.linear_scores(df, {"a": 0.5}, bias=0.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    import pytest

    with pytest.raises(ValueError):
        qc.linear_scores(df, {})
