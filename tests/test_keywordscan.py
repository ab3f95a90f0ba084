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


def test_flat_scan_matches_dict_scan():
    # The vectorized flat-DFA stepper must agree with the reference
    # dict stepping on random corpora, including unicode outside the
    # vocabulary alphabet, overlapping terms, and the scalar-tail path
    # (one text much longer than the rest drops the active set below
    # the vectorization cutoff).
    rng = random.Random(21)
    vocab = list(
        dict.fromkeys(
            "".join(rng.choice("abcdé") for _ in range(rng.randint(1, 5)))
            for _ in range(120)
        )
    )
    texts = [
        "".join(rng.choice("abcdeé ☃") for _ in range(rng.randint(0, 80)))
        for _ in range(200)
    ]
    texts += ["".join(rng.choice("abcdé") for _ in range(5000)), "", None]
    auto = ks.build_automaton(vocab)
    flat = ks.build_flat_automaton(vocab)
    assert flat is not None
    got = ks.scan_batch_flat(texts, flat)
    for t, hits in zip(texts, got):
        if t is None:
            assert hits is None
            continue
        want = {vocab[i] for i in ks.scan_text(t, *auto)}
        assert {vocab[i] for i in hits} == want, t[:40]


def test_flat_fail_links_resolved():
    # 'ushers' exercises fail transitions (she→he, hers via fail out
    # merge); the dense table must have them pre-resolved.
    vocab = ["he", "she", "his", "hers"]
    flat = ks.build_flat_automaton(vocab)
    (hits,) = ks.scan_batch_flat(["ushers"], flat)
    assert {vocab[i] for i in hits} == {"he", "she", "hers"}


def test_dense_budget_fallback(spark, monkeypatch):
    # Over-budget vocabularies fall back to the (broadcast) dict path
    # with identical outputs.
    monkeypatch.setattr(ks, "DENSE_BUDGET_BYTES", 1)
    assert ks.build_flat_automaton(["he", "she"]) is None
    df = spark.createDataFrame([(1, "ushers"), (2, None)], "id long, text string")
    out = {r.id: r.keyword_hits for r in ks.keyword_hits(df, ["he", "she"]).collect()}
    assert out == {1: ["he", "she"], 2: None}
    flag = {r.id: r.flagged for r in ks.contains_any_scaled(df, ["he", "she"]).collect()}
    assert flag == {1: True, 2: None}


def test_empty_vocabulary_matches_nothing(spark):
    # terms=[] (a dynamically loaded blocklist that is empty this run)
    # must return empty hits / False, never crash the scanner — the
    # flat path's empty alphabet is the edge (review r15 finding).
    flat = ks.build_flat_automaton([])
    assert ks.scan_batch_flat(["hello", "", None], flat) == [set(), set(), None]
    df = spark.createDataFrame([(1, "anything"), (2, None)], "id long, text string")
    out = {r.id: r.keyword_hits for r in ks.keyword_hits(df, []).collect()}
    assert out == {1: [], 2: None}
    flag = {r.id: r.flagged for r in ks.contains_any_scaled(df, []).collect()}
    assert flag == {1: False, 2: None}


def test_cache_digest_distinguishes_nul_bearing_terms(spark):
    # ['a','b'] and ['a\x00b'] must get DISTINCT cache entries (a
    # separator-joined digest would collide and serve the wrong
    # automaton).
    ks._BC_CACHE.clear()
    ks._automaton_broadcast(spark.sparkContext, ["a", "b"])
    ks._automaton_broadcast(spark.sparkContext, ["a\x00b"])
    assert len(ks._BC_CACHE) == 2


def test_broadcast_cached_per_vocabulary(spark):
    # Repeated scans of the same vocabulary must reuse ONE broadcast
    # (a per-micro-batch caller would otherwise accumulate multi-MB
    # broadcasts until the workers thrash); distinct vocabularies get
    # distinct entries, and eviction keeps the cache bounded.
    ks._BC_CACHE.clear()
    df = spark.createDataFrame([(1, "ushers")], "id long, text string")
    ks.keyword_hits(df, ["he", "she"]).collect()
    ks.contains_any_scaled(df, ["he", "she"]).collect()
    assert len(ks._BC_CACHE) == 1
    ks.keyword_hits(df, ["his"]).collect()
    assert len(ks._BC_CACHE) == 2
    for i in range(ks._BC_CACHE_MAX + 2):
        ks._automaton_broadcast(spark.sparkContext, [f"evict{i}"])
    assert len(ks._BC_CACHE) == ks._BC_CACHE_MAX


def test_null_and_errors(spark):
    df = spark.createDataFrame([(1, None), (2, "he said")], "id long, text string")
    out = {r.id: r for r in ks.keyword_hits(df, ["he"]).collect()}
    assert out[1].keyword_hits is None
    assert out[2].keyword_hits == ["he"]
    import pytest

    with pytest.raises(ValueError):
        ks.build_automaton(["ok", ""])
