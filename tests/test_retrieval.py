"""BM25 corpus scoring — Spark plan vs a plain-Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from electrician_spark.operators import retrieval


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick quick fox"),
    (3, "lorem ipsum dolor sit amet"),
    (4, "a lazy afternoon with a lazy cat and a lazy dog"),
    (5, "fox"),
    (6, "dog dog dog dog dog dog dog dog dog dog"),
]
TERMS = ["quick", "fox", "dog"]


def test_bm25_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r.doc_id: r.bm25
        for r in retrieval.bm25_scores(docs, TERMS).collect()
    }
    want = retrieval.reference_bm25(CORPUS, TERMS)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_bm25_term_saturation_and_length_norm(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in retrieval.bm25_scores(docs, TERMS).collect()}
    # doc 2 has tf(quick)=3 but saturation keeps it < 3x doc 1's single hit
    one_hit = retrieval.reference_bm25(CORPUS, ["quick"])[1]
    assert got[2] < 3 * retrieval.bm25_scores(
        docs, ["quick"]
    ).filter(F.col("doc_id") == 1).collect()[0].bm25 + got[5]
    # non-matching docs are absent, not zero-scored
    assert 3 not in got


def test_bm25_plan_stays_narrow(spark):
    """The corpus-side explode must filter to the query vocabulary
    before any exchange, and df/avgdl must broadcast."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan = retrieval.bm25_scores(docs, TERMS)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
