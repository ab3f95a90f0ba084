"""Aho-Corasick keyword scanning: classic overlapping-pattern cases,
equality with the codegen contains_any expression on random corpora,
list-of-hits semantics, NULL handling."""

import random

from pyspark.sql import functions as F

from electrician_spark.functions.scalar import contains_any
from electrician_spark.operators import keywordscan as ks


def test_automaton_classic_overlaps():
    terms = ["he", "she", "his", "hers"]
    auto = ks.build_automaton(terms)
    assert {terms[i] for i in ks.scan_text("ushers", *auto)} == {"he", "she", "hers"}
    assert {terms[i] for i in ks.scan_text("history", *auto)} == {"his"}
    assert ks.scan_text("xyz", *auto) == set()
    assert {terms[i] for i in ks.scan_text("hehe", *auto)} == {"he"}


def test_automaton_substring_terms():
    terms = ["a", "ab", "abc", "bc"]
    auto = ks.build_automaton(terms)
    assert {terms[i] for i in ks.scan_text("abc", *auto)} == {"a", "ab", "abc", "bc"}
    assert {terms[i] for i in ks.scan_text("zbcz", *auto)} == {"bc"}


def test_equality_with_codegen_contains_any(spark):
    rng = random.Random(7)
    vocab = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 4))) for _ in range(40)]
    vocab = list(dict.fromkeys(vocab))
    texts = ["".join(rng.choice("abcde ") for _ in range(rng.randint(0, 60))) for _ in range(300)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    fast = {r.id: r.flagged for r in ks.contains_any_scaled(df, vocab).collect()}
    slow = {
        r.id: r.flagged
        for r in df.withColumn("flagged", contains_any(F.col("text"), vocab)).collect()
    }
    assert fast == slow
    # hits list agrees with per-term containment
    hits = {r.id: set(r.keyword_hits) for r in ks.keyword_hits(df, vocab).collect()}
    for i, t in enumerate(texts):
        assert hits[i] == {v for v in vocab if v in t}, i


def test_null_and_errors(spark):
    df = spark.createDataFrame([(1, None), (2, "he said")], "id long, text string")
    out = {r.id: r for r in ks.keyword_hits(df, ["he"]).collect()}
    assert out[1].keyword_hits is None
    assert out[2].keyword_hits == ["he"]
    import pytest

    with pytest.raises(ValueError):
        ks.build_automaton(["ok", ""])
