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


# --- Unigram-LM tokenizer (Kudo 2018) ----------------------------------------


def _enumerate_segmentations(word, logp, max_len):
    """Brute-force all segmentations — exact reference for the
    forward-backward expected counts and the total likelihood."""
    import math

    segs = []

    def rec(i, cur):
        if i == len(word):
            segs.append(list(cur))
            return
        for l in range(1, min(max_len, len(word) - i) + 1):
            p = word[i : i + l]
            if p in logp:
                cur.append(p)
                rec(i + l, cur)
                cur.pop()

    rec(0, [])
    if not segs:
        return {}, float("-inf")
    seg_lps = [sum(logp[p] for p in s) for s in segs]
    m = max(seg_lps)
    total = m + math.log(sum(math.exp(x - m) for x in seg_lps))
    counts = {}
    for s, slp in zip(segs, seg_lps):
        w = math.exp(slp - total)
        for p in s:
            counts[p] = counts.get(p, 0.0) + w
    return counts, total


def test_unigram_estep_matches_enumeration():
    """Forward-backward expected counts must equal the brute-force
    enumeration over every segmentation — the algorithmic core pin."""
    import math

    from electrician_spark.functions.tokenizer import _unigram_estep

    logp = {p: math.log(v) for p, v in {
        "a": 0.2, "b": 0.15, "ab": 0.25, "ba": 0.1, "bab": 0.2, "abab": 0.1,
    }.items()}
    for word in ("abab", "ababab", "ba", "a"):
        got_counts, got_ll = _unigram_estep(word, 3, logp, max_len=4)
        ref_counts, ref_total = _enumerate_segmentations(word, logp, 4)
        assert abs(got_ll - 3 * ref_total) < 1e-9, word
        assert set(got_counts) == set(ref_counts), word
        for p in ref_counts:
            assert abs(got_counts[p] - 3 * ref_counts[p]) < 1e-9, (word, p)


def test_unigram_viterbi_deterministic_and_total():
    import math

    from electrician_spark.functions.tokenizer import _unigram_viterbi

    logp = {p: math.log(v) for p, v in {
        "a": 0.05, "b": 0.05, "ab": 0.4, "ba": 0.1, "abab": 0.4,
    }.items()}
    assert _unigram_viterbi("abab", logp, 4) == ["abab"]
    # equal-score tie ('ab'+'abab' vs 'abab'+'ab'): the backward scan
    # prefers the LONGEST piece at each boundary from the end
    assert _unigram_viterbi("ababab", logp, 4) == ["ab", "abab"]
    # unseen chars in a word with full char coverage: falls back cleanly
    assert "".join(_unigram_viterbi("baab", logp, 4)) == "baab"


def test_unigram_trainer_learns_compressive_pieces(spark):
    """A corpus dominated by repeated multi-char patterns must yield a
    model whose Viterbi encoding is SHORTER than character-level, with
    the dominant patterns present as pieces; training is deterministic
    and probabilities normalize."""
    import math

    from electrician_spark.functions.tokenizer import (
        train_unigram_tokenizer,
        unigram_encode,
    )

    rows = [(i, "lowlow lowering lowering newest newest widest lowest " * 3)
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_unigram_tokenizer(
        df, vocab_size=60, max_piece_len=6, em_iters=2, top_n_words=1000,
    )
    pieces = {p for p, _ in model}
    assert any(len(p) >= 3 for p in pieces)  # learned multi-char pieces
    assert abs(sum(math.exp(lp) for _, lp in model) - 1.0) < 1e-6
    again = train_unigram_tokenizer(
        df, vocab_size=60, max_piece_len=6, em_iters=2, top_n_words=1000,
    )
    assert model == again  # deterministic end to end

    enc = unigram_encode(df.limit(3), model, max_piece_len=6)
    for r in enc.collect():
        joined = "".join(r.pieces)
        assert joined == r.text.replace(" ", "")  # lossless per word
        n_chars = len(joined)
        assert len(r.pieces) < n_chars  # compressive vs char-level


def test_unigram_trainer_respects_vocab_size(spark):
    from electrician_spark.functions.tokenizer import train_unigram_tokenizer
    from electrician_spark.io import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").limit(60)
    model = train_unigram_tokenizer(
        docs, vocab_size=300, max_piece_len=5, em_iters=1, top_n_words=2000,
    )
    pieces = [p for p, _ in model]
    n_chars = sum(1 for p in pieces if len(p) == 1)
    # size cap holds up to the unprunable alphabet
    assert len(pieces) <= max(300, n_chars + 1)
    # every character that appears in some piece is itself a piece, so
    # Viterbi segmentation is total over the training charset
    charset = {c for p in pieces for c in p}
    assert charset == {p for p in pieces if len(p) == 1} | {
        c for p in pieces if len(p) > 1 for c in p
    }
    assert all(len(p) == 1 for p in pieces if len(p) == 1)


# --- WordPiece (Schuster & Nakajima 2012) ------------------------------------


def _wp_reference_train(word_counts: dict[str, int], vocab_size: int) -> list[str]:
    """Independent recount-style coding of the WordPiece spec: merge
    the pair maximizing count(ab)/(count(a)·count(b)), ties to the
    lexicographically larger pair."""
    words = {
        tuple([w[0]] + ["##" + c for c in w[1:]]): c for w, c in word_counts.items()
    }
    vocab = {s for sym in words for s in sym}
    while len(vocab) + 1 < vocab_size:
        sc: Counter = Counter()
        pc: Counter = Counter()
        for sym, c in words.items():
            for s in sym:
                sc[s] += c
            for p in zip(sym, sym[1:]):
                pc[p] += c
        cands = [(c / (sc[a] * sc[b]), (a, b)) for (a, b), c in pc.items() if c >= 2]
        if not cands:
            break
        _, (a, b) = max(cands)
        merged = a + (b[2:] if b.startswith("##") else b)
        vocab.add(merged)
        new = {}
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        words = new
    return ["[UNK]"] + sorted(vocab)


def test_wordpiece_trainer_matches_reference(spark):
    word_counts = {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5}
    texts = [" ".join([w] * c) for w, c in word_counts.items()]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe.train_wordpiece_vocab(df, vocab_size=18, min_count=1)
    want = _wp_reference_train(word_counts, 18)
    assert got == want
    assert got[0] == "[UNK]" and "##g" in got
    again = bpe.train_wordpiece_vocab(df, vocab_size=18, min_count=1)
    assert got == again  # deterministic


def test_wordpiece_greedy_longest_match():
    vocab = {"un", "##aff", "##able", "##a", "a", "b", "##b", "##le"}
    assert bpe.wordpiece_word("unaffable", vocab) == ["un", "##aff", "##able"]
    # greedy prefers the longest prefix at each step
    assert bpe.wordpiece_word("able", vocab) == ["a", "##b", "##le"]
    # unsegmentable remainder -> whole-word UNK (BERT rule)
    assert bpe.wordpiece_word("zzz", vocab) == ["[UNK]"]
    assert bpe.wordpiece_word("ax", vocab) == ["[UNK]"]


def test_wordpiece_encode_roundtrip_on_corpus(spark):
    from electrician_spark.io import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").limit(60)
    vocab = bpe.train_wordpiece_vocab(docs, vocab_size=400, min_count=1)
    assert len(vocab) <= 400
    enc = bpe.wordpiece_encode(docs.limit(5), vocab)
    for r in enc.collect():
        words = r.text.split()
        # re-segment per word: pieces concat (## stripped) == word
        i = 0
        for w in words:
            ps = bpe.wordpiece_word(w, set(vocab))
            assert r.pieces[i : i + len(ps)] == ps
            if ps != ["[UNK]"]:
                assert "".join(p[2:] if p.startswith("##") else p for p in ps) == w
            i += len(ps)
        assert i == len(r.pieces)


def test_tokenizer_artifacts_round_trip(spark, tmp_path):
    """save/load must reproduce bit-identical encodings for all three
    families — the train-once/reuse-everywhere contract."""
    from electrician_spark.functions import tokenizer as tk

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "the five boxing wizards jump quickly",
        ] * 5)],
        "doc_id long, text string",
    )
    sample = spark.createDataFrame([(1, "the quick wizard packs jugs")],
                                   "doc_id long, text string")

    merges = tk.train_bpe_merges(docs, num_merges=40, min_count=1)
    tk.save_tokenizer(str(tmp_path / "bpe.json"), "bpe", merges)
    kind, back = tk.load_tokenizer(str(tmp_path / "bpe.json"))
    assert kind == "bpe" and back == merges
    a = tk.bpe_encode(sample, merges).collect()[0]
    b = tk.bpe_encode(sample, back).collect()[0]
    assert a.bpe_tokens == b.bpe_tokens

    vocab = tk.train_wordpiece_vocab(docs, vocab_size=80, min_count=1)
    tk.save_tokenizer(str(tmp_path / "wp.json"), "wordpiece", vocab)
    kind, backv = tk.load_tokenizer(str(tmp_path / "wp.json"))
    assert kind == "wordpiece" and backv == vocab
    a = tk.wordpiece_encode(sample, vocab).collect()[0]
    b = tk.wordpiece_encode(sample, backv).collect()[0]
    assert a.pieces == b.pieces

    pieces = tk.train_unigram_tokenizer(docs, vocab_size=60)
    tk.save_tokenizer(str(tmp_path / "ug.json"), "unigram", pieces)
    kind, backp = tk.load_tokenizer(str(tmp_path / "ug.json"))
    assert kind == "unigram" and backp == pieces  # exact float round-trip
    a = tk.unigram_encode(sample, pieces).collect()[0]
    b = tk.unigram_encode(sample, backp).collect()[0]
    assert a.pieces == b.pieces

    import pytest as _pt

    with _pt.raises(ValueError):
        tk.save_tokenizer(str(tmp_path / "x.json"), "sentencepiece", [])
    (tmp_path / "bad.json").write_text('{"type": "mystery", "data": []}')
    with _pt.raises(ValueError):
        tk.load_tokenizer(str(tmp_path / "bad.json"))


def test_quantize_logprobs_dyadic_exact_and_sorted():
    """Quantized logprobs are exact multiples of 2^-bits (binary64-
    representable, so DP sums are exact in ANY engine) and the list
    keeps the trainer's (logprob desc, piece) order contract."""
    model = [("ab", -1.2345678), ("a", -0.1), ("b", -7.7), ("zz", -0.1)]
    qm = bpe.quantize_logprobs(model, bits=20)
    for p, lp in qm:
        k = lp * (1 << 20)
        assert k == int(k), (p, lp)
        assert abs(lp - dict(model)[p]) <= 2 ** -21 + 1e-12
    assert qm == sorted(qm, key=lambda kv: (-kv[1], kv[0]))


def test_unigram_frozen_model_reproduces(spark):
    """The q_ug1 oracle freezes the quantized model trained on the
    shared mini-corpus; re-training must land on the same dyadic grid
    points bit-for-bit (the trainer's determinism contract — sorted
    driver-side tables make the float EM accumulation order fixed)."""
    from electrician_spark.queries import _UG_FROZEN_MODEL, _WP_MINI_CORPUS

    mini = spark.createDataFrame([(t,) for t in _WP_MINI_CORPUS], "text string")
    model = bpe.train_unigram_tokenizer(
        mini, vocab_size=60, max_piece_len=6, em_iters=2
    )
    qm = bpe.quantize_logprobs(model, bits=20)
    got = [(p, int(lp * (1 << 20))) for p, lp in qm]
    assert got == list(_UG_FROZEN_MODEL)


def test_unigram_hard_em_round_matches_python_reference(spark):
    """One Viterbi-EM round == the plain-Python replay: identical
    E-step piece counts, identical exact-integer objectives, and a
    new model equal up to the documented 1-ulp ln boundary."""
    import math
    from collections import Counter

    corpus = [
        "data data fast fast the merge merge",
        "the merge fast data stream stream",
        "slow slow merge data the fast",
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    trained = bpe.train_unigram_tokenizer(
        df, vocab_size=20, max_piece_len=4, em_iters=1
    )
    qm = bpe.quantize_logprobs(trained, bits=20)
    new_model, stats = bpe.unigram_hard_em_round(df, qm, max_piece_len=4)

    q = 1 << 20
    logp = dict(qm)
    lp_u = {p: round(lp * q) for p, lp in qm}
    wf = Counter(w for t in corpus for w in t.split())
    counts: Counter = Counter()
    old = 0
    for w, f in wf.items():
        for p in bpe._unigram_viterbi(w, logp, 4):
            if p in lp_u:
                counts[p] += f
                old += lp_u[p] * f
    assert stats["old_obj_u"] == old
    assert stats["counts"] == {p: counts.get(p, 0) for p, _ in qm}
    assert stats["total_freq"] == sum(wf.values())
    total = sum(counts.get(p, 0) for p, _ in qm)
    k = len(qm)
    exp = {
        p: math.floor(math.log((counts.get(p, 0) + 0.5) / (total + 0.5 * k)) * q + 0.5)
        for p, _ in qm
    }
    got = {p: round(lp * q) for p, lp in new_model}
    assert got == exp  # exact: both sides use C-libm math.log + floor


def test_unigram_hard_em_improves_objective_from_rough_init(spark):
    """Hard EM's monotone-improvement guarantee, pinned on a rough
    (uniform) initial model where a real gap exists: one round must
    strictly increase the exact freq-weighted Viterbi objective."""
    import math

    corpus = [
        "merge merge merge stream stream data",
        "stream merge data data merge stream",
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    chars = sorted({c for t in corpus for c in t if c != " "})
    pieces = chars + ["merge", "stream", "data", "me", "st"]
    u = math.log(1.0 / len(pieces))
    init = bpe.quantize_logprobs([(p, u) for p in pieces], bits=20)
    _, stats = bpe.unigram_hard_em_round(df, init, max_piece_len=6)
    assert stats["new_obj_u"] > stats["old_obj_u"]


def test_unigram_soft_em_likelihood_monotone_three_sweeps():
    """The production soft-EM trainer's trajectory, property-pinned on
    the REAL update rule (_soft_em_sweeps — the exact function
    train_unigram_tokenizer runs): three consecutive sweeps on a
    frozen word table must each not decrease the freq-weighted corpus
    log-likelihood, and the trajectory must strictly improve from the
    uniform init. This is the strengthened pin standing in for a SQL
    oracle: soft EM's forward-backward posteriors are float sums over
    the segmentation lattice with no exact cross-engine form (the
    documented q_em1 waiver — hard EM is the family member whose every
    intermediate quantity is exact, and IS oracle-replayed)."""
    import math

    from electrician_spark.functions.tokenizer import (
        _soft_em_sweeps,
        _unigram_estep,
    )

    words = [("ababab", 3), ("abba", 2), ("baba", 4), ("aabb", 1), ("bb", 5)]
    pieces = ["a", "b", "ab", "ba", "bb", "aa", "abab"]
    logp = {p: math.log(1.0 / len(pieces)) for p in pieces}

    def ll(model):
        return sum(_unigram_estep(w, f, model, 4)[1] for w, f in words)

    prev = ll(logp)
    first = prev
    for sweep in range(3):
        logp = _soft_em_sweeps(words, logp, 1, 4)
        cur = ll(logp)
        assert cur >= prev - 1e-9, (sweep, prev, cur)
        prev = cur
    assert prev > first + 1e-6  # real improvement from uniform init
