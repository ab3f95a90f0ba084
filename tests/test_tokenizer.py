"""BPE trainer/encoder: equality against a plain-Python reference
implementation of Sennrich et al. 2016, plus encode/packing contracts."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from electrician_spark.functions import tokenizer as bpe
from electrician_spark.functions.text import bpe_pretokens

CORPUS = [
    "the lowest lower low",
    "the newest newer new",
    "lowest of the low, newest of the new",
    "he showed the newest slides; she showed the lowest price",
    "new lows and new highs in the newest report",
]


def _reference_train(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Plain-Python Sennrich trainer over the same pre-tokenization:
    word freq table -> repeat {count pairs, merge best}."""
    words: Counter = Counter()
    import re

    pat = re.compile(
        r"('s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+)"
    )
    for t in texts:
        for piece in pat.findall(t):
            if not piece.isspace():
                words[piece] += 1
    vocab = {tuple(w) + (bpe.END_OF_WORD,): c for w, c in words.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        pair, freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        merges.append(pair)
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], ["text"])


def test_train_matches_python_reference(spark):
    got = bpe.train_bpe_merges(_corpus_df(spark), num_merges=30, min_count=1)
    want = _reference_train(CORPUS, 30)
    assert got == want
    assert len(got) > 5  # the corpus genuinely supports many merges


def test_train_min_count_prunes_tail(spark):
    # min_count=3 keeps only words seen >=3 times; merges still come
    # from the surviving head and stay a prefix-consistent list.
    got = bpe.train_bpe_merges(_corpus_df(spark), num_merges=10, min_count=3)
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in got)


def test_encode_word_applies_merges_in_rank_order():
    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"), ("est", bpe.END_OF_WORD)]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("lowest", ranks) == ["low", "est</w>"]
    # unknown word: falls back to chars + sentinel where no merge fires
    assert bpe.encode_word("xyz", ranks) == ["x", "y", "z", bpe.END_OF_WORD]


def test_bpe_encode_dataframe_roundtrip(spark):
    df = _corpus_df(spark)
    merges = bpe.train_bpe_merges(df, num_merges=30, min_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    out = bpe.bpe_encode(df, merges).select("text", "bpe_tokens").collect()
    pieces_by_text = {
        r["text"]: r["p"]
        for r in df.select("text", bpe_pretokens(F.col("text")).alias("p")).collect()
    }
    for row in out:
        # driver-side re-encode of each pre-token must equal the UDF path
        want = []
        for piece in pieces_by_text[row["text"]]:
            want.extend(bpe.encode_word(piece, ranks))
        assert row["bpe_tokens"] == want
        # lossless within a piece: concatenation restores piece + sentinel
        joined = "".join(row["bpe_tokens"]).replace(bpe.END_OF_WORD, "")
        assert joined == "".join(pieces_by_text[row["text"]])


def test_bpe_encoded_length(spark):
    df = _corpus_df(spark)
    merges = bpe.train_bpe_merges(df, num_merges=30, min_count=1)
    rows = bpe.bpe_encoded_length(df, merges).select("text", "bpe_len").collect()
    enc = {
        r["text"]: len(r["bpe_tokens"])
        for r in bpe.bpe_encode(df, merges).select("text", "bpe_tokens").collect()
    }
    for r in rows:
        assert r["bpe_len"] == enc[r["text"]]
    # more merges => never more tokens on the training corpus
    few = bpe.bpe_encoded_length(df, merges[:5], out_col="l5").select("text", "l5").collect()
    few_by_text = {r["text"]: r["l5"] for r in few}
    for r in rows:
        assert r["bpe_len"] <= few_by_text[r["text"]]


def test_vocab_layout():
    merges = [("l", "o"), ("lo", "w"), ("l", "o")]  # dup merged symbol ignored
    v = bpe.bpe_vocab(merges, base_alphabet="low")
    assert v == ["l", "o", "w", "lo", "low"]


def test_bpe_encode_plan_is_arrow_batched(spark):
    merges = [("l", "o")]
    df = spark.createDataFrame([(1, "low")], ["doc_id", "text"])
    plan = (
        bpe.bpe_encode(df, merges)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_incremental_trainer_matches_reference_at_2000_merges():
    # The r5 trainer recounted every pair per merge — O(merges · Σ|word|)
    # driver time (hours at a production 32k merges). The incremental
    # loop (pair counts + pair→words index + lazy-deletion heap) must
    # produce the IDENTICAL merge list; pin it well past fixture scale
    # and bound its wall time.
    import random
    import time

    random.seed(11)
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab: dict = {}
    for _ in range(900):
        w = "".join(random.choice(letters) for _ in range(random.randint(4, 12)))
        syms = tuple(w) + (bpe.END_OF_WORD,)
        vocab[syms] = vocab.get(syms, 0) + random.randint(2, 200)

    t0 = time.time()
    inc = bpe._merge_loop(dict(vocab), 2000)
    elapsed = time.time() - t0
    assert len(inc) == 2000
    assert elapsed < 30.0  # actual ~0.1 s; the recount loop takes ~5 s here
    assert inc == bpe._train_bpe_merges_reference(dict(vocab), 2000)


def test_bpe_encode_null_text_propagates(spark):
    # A NULL text row must yield NULL tokens, not crash the batch
    # (matches normalize_text's NULL propagation).
    merges = [("l", "o")]
    df = spark.createDataFrame(
        [(1, "low"), (2, None), (3, "lot")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["bpe_tokens"] for r in bpe.bpe_encode(df, merges).collect()}
    assert rows[1] == ["lo", "w", bpe.END_OF_WORD]
    assert rows[2] is None
    assert rows[3] == ["lo", "t", bpe.END_OF_WORD]
