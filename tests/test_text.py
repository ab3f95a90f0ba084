"""Text-analysis functions: PII redaction shapes and repetition
signals (the q_x* oracle rows cover the rest end-to-end)."""

from __future__ import annotations

from pyspark.sql import functions as F

from electrician_spark.functions import text as tx


def _one(spark, s: str, col):
    return spark.createDataFrame([(s,)], ["text"]).select(col.alias("out")).first()["out"]


def test_redact_email_and_long_numbers(spark):
    out = _one(
        spark,
        "mail bob.smith+x@sub.example.co.uk or call 12345678901 now",
        tx.redact_pii(F.col("text")),
    )
    assert out == "mail <EMAIL> or call <NUM> now"


def test_redact_preserves_short_numbers_and_plain_text(spark):
    s = "order 42 of 1969 items at 3.14 each"
    assert _one(spark, s, tx.redact_pii(F.col("text"))) == s


def test_redact_all_occurrences(spark):
    out = _one(spark, "a@b.com c@d.org", tx.redact_pii(F.col("text")))
    assert out == "<EMAIL> <EMAIL>"


def test_repetition_fractions(spark):
    df = spark.createDataFrame(
        [("a a a a",), ("a b c d",), ("a b a b",)], ["text"]
    ).select(tx.tokens(F.col("text")).alias("toks"))
    reps = tx.token_repetition_stats(F.col("toks"))
    rows = df.select(
        reps["dup_token_frac"].alias("dtf"), reps["dup_bigram_frac"].alias("dbf")
    ).collect()
    # "a a a a": 1 distinct of 4 → 0.75; bigrams: ["a a"]x3 → 1 - 1/3
    assert abs(rows[0]["dtf"] - 0.75) < 1e-9
    assert abs(rows[0]["dbf"] - (1 - 1 / 3)) < 1e-9
    # all distinct → 0 dup
    assert rows[1]["dtf"] == 0.0 and rows[1]["dbf"] == 0.0
    # "a b a b": 2 distinct of 4 → 0.5; bigrams ab,ba,ab → 1 - 2/3
    assert abs(rows[2]["dtf"] - 0.5) < 1e-9
    assert abs(rows[2]["dbf"] - (1 - 2 / 3)) < 1e-9


def test_repetition_empty_and_single_token(spark):
    df = spark.createDataFrame([("solo",)], ["text"]).select(
        tx.tokens(F.col("text")).alias("toks")
    )
    reps = tx.token_repetition_stats(F.col("toks"))
    row = df.select(
        reps["dup_token_frac"].alias("dtf"), reps["dup_bigram_frac"].alias("dbf")
    ).first()
    assert row["dtf"] == 0.0 and row["dbf"] == 0.0


def test_bpe_pretokens_match_duckdb_and_count_sanely(spark):
    """The BPE-ish pre-tokenizer must (a) produce the same pieces in
    Spark (Java regex) and DuckDB (RE2) for the shared pattern, and
    (b) count contractions/punctuation/digit runs the way the GPT-2
    pre-tokenizer family does."""
    import duckdb

    from electrician_spark.functions.text import (
        BPE_PRETOKEN_PATTERN,
        bpe_pretokens,
        bpe_token_count,
    )

    samples = [
        "I'll say it's 42 tokens, isn't it?!",
        "hello   world",
        "foo_bar-baz 2024-01-01 3.14",
        "", "   ", "...!!!", "café déjà vu",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, s string")
    got = {
        r.i: (list(r.toks), r.n)
        for r in df.select(
            "i",
            bpe_pretokens(F.col("s")).alias("toks"),
            bpe_token_count(F.col("s")).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        duck = [
            t for t in con.execute(
                "SELECT regexp_extract_all(?, ?)", [s, f"({BPE_PRETOKEN_PATTERN})"]
            ).fetchone()[0]
            if not t.isspace() and t != ""
        ]
        assert got[i][0] == duck, (i, s, got[i][0], duck)
        assert got[i][1] == len(duck)
    # shape checks on the first sample
    toks0 = got[0][0]
    assert "'ll" in toks0 and "'s" in toks0  # contractions split off
    assert " 42" in toks0  # digit run keeps its leading space
    assert "?!" in toks0  # punctuation run


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------


def _gopher_flags(spark, text, **kw):
    from electrician_spark.functions import text as tx

    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(tx.gopher_quality_flags(F.col("text"), **kw).alias("g"))
        .collect()[0]
        .g
    )
    return row.asDict()


GOOD_DOC = (
    "The results show that we have to be careful with the analysis of long "
    "documents and that the method scales to large corpora with stable "
    "behaviour across runs. " * 3
)


def test_gopher_passes_normal_prose(spark):
    flags = _gopher_flags(spark, GOOD_DOC)
    assert flags["passes"] and all(flags.values())


def test_gopher_each_rule_fires_independently(spark):
    # word count: under 50 words
    f = _gopher_flags(spark, "The quick brown fox has to be here with that.")
    assert not f["word_count_ok"] and f["required_words_ok"]
    # avg word length: single-char words
    f = _gopher_flags(spark, " ".join(["a"] * 60))
    assert not f["avg_word_len_ok"]
    # symbol ratio: hash-heavy text
    f = _gopher_flags(spark, GOOD_DOC + " " + "#" * 40)
    assert not f["symbol_ratio_ok"]
    # bullets on ≥90% of lines
    bullet_doc = "\n".join(f"- item {i} of the listing" for i in range(20))
    f = _gopher_flags(spark, bullet_doc)
    assert not f["bullet_ratio_ok"]
    # ellipsis line endings over 30%
    ell_doc = "\n".join(
        ("we continue..." if i % 2 else "a full sentence here") for i in range(20)
    )
    f = _gopher_flags(spark, ell_doc)
    assert not f["ellipsis_ratio_ok"]
    # alphabetic-word ratio: numbers-only words
    f = _gopher_flags(spark, " ".join(str(i) for i in range(100)))
    assert not f["alpha_word_ratio_ok"]
    # required-word set: prose avoiding all 8 required words
    f = _gopher_flags(
        spark, " ".join(["zebra lion gazelle runs fast across plains"] * 10)
    )
    assert not f["required_words_ok"]


def test_gopher_filter_on_fixture_corpus(spark):
    from electrician_spark.functions import text as tx
    from electrician_spark.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    # relaxed thresholds (fixture docs are short synthetic text): the
    # filter must be a strict subset and agree with per-rule flags
    kept = tx.gopher_filter(docs, min_words=5, min_required_words=0).count()
    assert 0 < kept <= n
    flags = docs.select(
        tx.gopher_quality_flags(
            F.col("text"), min_words=5, min_required_words=0
        )["passes"].alias("p")
    )
    assert kept == flags.filter("p").count()


def test_gopher_ratios_match_python_reference(spark):
    """Symbol/bullet/ellipsis/alpha ratios equal a plain-Python count
    on a mixed stress document."""
    doc = (
        "- bullet line one\n"
        "text line with # and # symbols\n"
        "trailing thoughts...\n"
        "1) numbered bullet\n"
        "normal closing line"
    )
    toks = doc.split()
    n_words = len(toks)
    n_symbols = doc.count("#") + doc.count("…") + doc.count("...")
    lines = doc.split("\n")
    import re

    bullets = sum(1 for l in lines if re.match(r"^([-*•▪◼]|\d+[.)])\s", l.strip()))
    ells = sum(1 for l in lines if re.search(r"(\.\.\.|…)$", l.rstrip()))
    alpha = sum(1 for t in toks if re.search("[A-Za-z]", t))

    f = _gopher_flags(spark, doc)
    assert f["symbol_ratio_ok"] == (n_symbols / n_words <= 0.1)
    assert f["bullet_ratio_ok"] == (bullets / len(lines) < 0.9)
    assert f["ellipsis_ratio_ok"] == (ells / len(lines) <= 0.3)
    assert f["alpha_word_ratio_ok"] == (alpha / n_words >= 0.8)
