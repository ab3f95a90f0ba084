"""Corpus retrieval scoring — TF-IDF / BM25 (LLM-pipeline extension).

Quality-weighted retrieval over the documents table: the standard
relevance primitive for curriculum selection ("score every document
against a topic term set") and for contamination triage beyond exact
shingle containment. Everything is codegen'd column algebra — one
explode+groupBy over matched terms only (the scan filters to the query
vocabulary BEFORE the shuffle, so corpus-wide term explosion never
hits the exchange), one broadcast of per-term document frequencies,
one final per-doc aggregation.

At 100 TB: the (doc, term) shuffle carries only docs containing query
terms (query vocabularies are tens of terms); df/avgdl are scalar-size
broadcasts. No full posting list is ever materialized.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from electrician_spark.functions.text import tokens


def term_matches(docs: DataFrame, terms: list[str], id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, term, tf, dl) for every document containing a query term.
    The isin filter runs before the explode's output shuffles."""
    toks = tokens(F.lower(F.col(text_col)))
    base = docs.select(
        F.col(id_col).alias("_id"), toks.alias("_tk")
    ).select("_id", F.size("_tk").alias("dl"), F.explode("_tk").alias("term"))
    return (
        base.filter(F.col("term").isin(*terms))
        .groupBy("_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every matching document against ``terms``
    (Robertson/Sparck-Jones idf with the +1 smoothing Lucene uses, so
    scores are always positive). Returns (id, score, n_matched) sorted
    is left to the caller (top-k via relational.top_k keeps it a
    TakeOrderedAndProject)."""
    m = term_matches(docs, terms, id_col, text_col)
    # single-row corpus-stats broadcast: plans as a 1-row
    # BroadcastNestedLoopJoin — the sanctioned bounds-join pattern
    # (cf. quantize.py / olap.py winsorize); a constant equi-key can't
    # force a hash join because Catalyst folds `1 = 1` back to a
    # condition-free join. Build side is always exactly one row.
    stats = docs.select(
        F.count("*").alias("n"),
        F.avg(F.size(tokens(F.lower(F.col(text_col))))).alias("avgdl"),
    )
    dfreq = m.groupBy("term").agg(F.countDistinct("_id").alias("df"))
    scored = (
        m.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.round(F.sum("w"), 6).alias("bm25"),
        F.count("*").alias("n_matched"),
    )


def reference_bm25(corpus: list[tuple[int, str]], terms: list[str],
                   k1: float = 1.2, b: float = 0.75) -> dict[int, float]:
    """Plain-Python oracle for tests: same tokenization (whitespace,
    lowercased), same idf/tf formulas."""
    tokenized = {i: t.lower().split() for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in tokenized.values()) / n
    dfreq = {
        term: sum(1 for t in tokenized.values() if term in t) for term in terms
    }
    out: dict[int, float] = {}
    for i, toks in tokenized.items():
        s = 0.0
        for term in terms:
            tf = toks.count(term)
            if not tf:
                continue
            idf = math.log((n - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s:
            out[i] = round(s, 6)
    return out
