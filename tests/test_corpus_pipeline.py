"""End-to-end LLM-corpus build: the round-trip showcase composing the
pipeline a pretraining data build actually runs, with an invariant
pinned at every stage. Everything stays one lazy DataFrame chain until
the assertions force it."""

from __future__ import annotations

from pyspark.sql import functions as F

from electrician_spark.functions import text as tx
from electrician_spark.operators import dedup, packing, sampling


def _synthetic_corpus(spark):
    base = [
        # (id, domain, body) — near-dups, boilerplate lines, junk docs
        (1, "wiki", "alpha beta gamma delta epsilon zeta eta theta iota kappa\ncommon footer"),
        (2, "wiki", "alpha beta gamma delta epsilon zeta eta theta iota kappa\ncommon footer"),  # exact dup of 1
        (3, "wiki", "one two three four five six seven eight nine ten eleven twelve\ncommon footer"),
        (4, "crawl", "spam spam spam"),  # too short -> quality gate
        (5, "crawl", "the sun rose over the quiet harbor and the boats drifted slowly out to sea\ncommon footer"),
        (6, "crawl", "a completely different story about mountains rivers forests and the people living there\ncommon footer"),
        (7, "crawl", "yet another document with enough ordinary words to pass the simple quality gates here\ncommon footer"),
        (8, "books", "call me ishmael some years ago never mind how long precisely having little money\ncommon footer"),
        # embeds doc 3's 12-token sentence inside other prose -> the
        # substring-dedup stage strips it (doc 3 keeps the original)
        (9, "books", "preface words about the region one two three four five six seven eight nine ten eleven twelve and trailing commentary continues in ordinary prose here\ncommon footer"),
        # long enough to pass word-count gates but pathologically
        # repetitive -> the repetition filter kills it
        (10, "crawl", "buy now " * 12 + "limited offer"),
    ]
    return spark.createDataFrame(base, "doc_id long, domain string, text string")


def test_corpus_build_pipeline_composes(spark):
    docs = _synthetic_corpus(spark)

    # 1. exact dedup (keep lowest doc_id per fingerprint)
    d1 = dedup.exact_dedup(docs, keep_col="doc_id")
    ids1 = {r.doc_id for r in d1.select("doc_id").collect()}
    assert 2 not in ids1 and 1 in ids1  # dup dropped, first kept
    assert len(ids1) == 9

    # 2. corpus-wide line dedup: the shared footer survives only in its
    # first occurrence (doc 1); no document disappears
    d2 = dedup.line_dedup(d1, sep="\n")
    texts = {r.doc_id: r.text for r in d2.collect()}
    assert sum("common footer" in t for t in texts.values()) == 1
    assert set(texts) == ids1

    # 2b. exact substring dedup: doc 9's embedded copy of doc 3's
    # 12-token sentence is stripped (doc 3, the first occurrence,
    # keeps it); every other doc passes through token-identical
    d2b = dedup.strip_repeated_ngrams(d2, min_len=10)
    t2b = {r.doc_id: r.text for r in d2b.collect()}
    assert "one two three" in t2b[3]
    assert "one two three" not in t2b[9]
    assert "preface words" in t2b[9] and "trailing commentary" in t2b[9]
    assert t2b[5] == texts[5]

    # 2c. repetition gate: the "buy now buy now ..." doc dies on
    # dup-n-gram char share; normal prose survives (top-n-gram limits
    # relaxed — the paper's presuppose its >=50-word floor)
    d2c = tx.gopher_repetition_filter(
        d2b, top_limits={2: 0.6, 3: 0.6, 4: 0.6}
    )
    ids2c = {r.doc_id for r in d2c.select("doc_id").collect()}
    assert 10 not in ids2c and {3, 5, 9} <= ids2c

    # 3. quality gate: token-count floor removes the spam doc
    d3 = d2c.filter(tx.token_count(F.col("text")) >= 10)
    ids3 = {r.doc_id for r in d3.select("doc_id").collect()}
    assert 4 not in ids3 and len(ids3) == 7

    # rejoin domain for mixing (line_dedup projects id+text)
    d3dom = d3.join(docs.select("doc_id", "domain"), "doc_id")

    # 4. per-domain cap: keep at most 2 crawl docs, quality-ordered by
    # token count (deterministic tiebreak on id)
    d4 = sampling.cap_per_group(
        d3dom, ["domain"], 2,
        [tx.token_count(F.col("text")).desc(), F.col("doc_id")],
    )
    by_domain = {}
    for r in d4.collect():
        by_domain.setdefault(r.domain, []).append(r.doc_id)
    assert len(by_domain["crawl"]) == 2
    assert all(len(v) <= 2 for v in by_domain.values())

    # 5. mixture: keep all of books/wiki, drop unlisted domains entirely
    d5 = sampling.mixture_sample(d4, "domain", {"wiki": 1.0, "books": 1.0, "crawl": 1.0})
    assert d5.count() == d4.count()  # rate-1.0 mixture is the identity
    dropped = sampling.mixture_sample(d4, "domain", {"wiki": 1.0})
    assert {r.domain for r in dropped.collect()} == {"wiki"}

    # 6. sequence packing: every surviving doc gets a shard/offset and
    # per-shard offsets tile the token stream exactly
    d6 = packing.pack_sequences(
        d5.withColumn("n_tokens", tx.token_count(F.col("text"))),
        "n_tokens", budget=16, n_shards=2,
    )
    rows = d6.collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in d5.collect()}
    for shard in {r.shard for r in rows}:
        in_shard = sorted((r for r in rows if r.shard == shard), key=lambda r: r.start_offset)
        offset = 0
        for r in in_shard:
            assert r.start_offset == offset  # contiguous, gap-free stream
            assert r.pack_id == offset // 16
            offset += r.n_tokens


def test_corpus_build_pipeline_round5_stages(spark):
    """The round-5 curation additions composed end-to-end: normalize ->
    Gopher rules -> LM-perplexity buckets -> blocklist -> chunk -> BPE
    length budget. Each stage pins one invariant on the same corpus."""
    from electrician_spark.functions import tokenizer as bpe
    from electrician_spark.functions import url as u
    from electrician_spark.operators import lmquality as lmq
    from electrician_spark.operators.packing import chunk_documents

    raw = [
        (1, "https://good.example.com/a", "The  quick\tbrown fox jumps over the lazy dog near the river bank today"),
        (2, "https://good.example.com/b", "The quick brown fox jumps over the lazy dog near the river bank today"),
        (3, "https://spam.badsite.com/x", "The quick brown fox jumps over the lazy dog near the river bank today"),
        (4, "https://ok.org/y", "zz xq jw qq kv zx wq jj xx qz vk wj zq kx"),
    ]
    docs = spark.createDataFrame(raw, "doc_id long, url string, text string")

    # 1. normalize: docs 1 and 2 become byte-identical
    d1 = docs.withColumn("text", tx.normalize_text(F.col("text")))
    t = {r.doc_id: r.text for r in d1.collect()}
    assert t[1] == t[2]

    # 2. blocklist: the badsite doc drops without shuffling the corpus
    d2 = u.filter_blocklisted_domains(d1, ["badsite.com"], url_col="url")
    assert {r.doc_id for r in d2.collect()} == {1, 2, 4}

    # 3. LM buckets: train on the english-looking docs; the gibberish
    # doc lands in the worst bucket
    ref = d2.filter(F.col("doc_id").isin(1, 2))
    lm = lmq.unigram_lm(ref, alpha=0.5)
    scored = lmq.lm_score(d2, lm)
    b = lmq.perplexity_buckets(scored, n_buckets=2, labels=("head", "tail"),
                               relative_error=0.0)
    buckets = {r.doc_id: r.bucket for r in b.collect()}
    assert buckets[4] == "tail" and buckets[1] == "head"

    # 4. keep head docs, chunk them, and budget by trained BPE length
    keep = d2.join(b.filter(F.col("bucket") == "head").select("doc_id"), "doc_id")
    chunks = chunk_documents(keep, max_tokens=8, overlap=2)
    crows = chunks.collect()
    assert all(r.chunk_tokens <= 8 for r in crows)
    assert {r.doc_id for r in crows} <= {1, 2}

    merges = bpe.train_bpe_merges(keep, num_merges=20, min_count=1)
    budgeted = bpe.bpe_encoded_length(chunks, merges, text_col="chunk_text")
    assert all(r.bpe_len >= r.chunk_tokens for r in budgeted.collect())


def test_corpus_build_pipeline_round6_stages(spark, tmp_path):
    """The round-6 additions composed end-to-end: bigram-LM scoring →
    SemDeDup on (stub) embeddings → best-fit packing → reproducible
    shard export with a verified manifest. One invariant per stage."""
    from electrician_spark.io import (
        read_table,
        verify_training_shards,
        write_training_shards,
    )
    from electrician_spark.operators import lmquality as lmq
    from electrician_spark.operators import quantize, similarity as sim
    from electrician_spark.operators.packing import pack_best_fit, packing_stats
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")

    # 1. bigram Stupid-Backoff quality scores on a reference slice:
    # every doc scores, and a doc built from reference bigrams scores
    # better than shuffled junk made of the same unigrams
    ref = docs.filter(F.col("doc_id") % 10 == 0)
    uni, bi = lmq.bigram_lm(ref, vocab_size=200, max_bigrams=5000, alpha=0.5)
    scored = lmq.lm_score_bigram(docs, uni, bi)
    assert scored.filter(F.col("mean_logscore").isNull()).count() == 0

    # 2. SemDeDup with the embeddings table's own labels: the survivor
    # set is a subset of the corpus and every dropped id had a >= 0.4
    # within-label neighbor with a smaller id
    emb = read_table(spark, SF_SMOKE, "embeddings")
    kept = sim.semantic_dedup(emb, threshold=0.4, label_col="label", blocks=2)
    assert 0 < kept.count() <= emb.count()

    # 3. PQ codes + ADC search over the deduped embeddings: every query
    # gets k ranked neighbors with non-decreasing distance
    books = quantize.pq_train(kept, m=4, k=8, iters=1)
    coded = quantize.pq_encode(kept, books)
    hits = quantize.pq_topk(coded, kept.limit(3), books, k=3).collect()
    by_q: dict = {}
    for r in hits:
        by_q.setdefault(r.query_id, []).append((r.rank, r.dist))
    for ranked in by_q.values():
        dists = [d for _, d in sorted(ranked)]
        assert dists == sorted(dists)

    # 4. token budgets -> best-fit packs: no pack over budget except
    # singleton-oversized ones
    from electrician_spark.functions.text import token_count

    budgeted = docs.withColumn("n_tokens", token_count(F.col("text")).cast("long"))
    packed = pack_best_fit(budgeted, "n_tokens", budget=120, n_shards=2)
    stats = packing_stats(packed, "n_tokens", 120).collect()
    for r in stats:
        assert r.used_tokens <= 120 or r.n_docs == 1

    # 5. export + verify: manifest matches the written shards
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, n_shards=3)
    assert manifest.count() == 3
    v = verify_training_shards(spark, out).collect()
    assert len(v) == 3 and all(r.ok for r in v)


def test_corpus_build_pipeline_round7_stages(spark, tmp_path):
    """The round-7 additions composed end-to-end: C4 cleaning →
    model-based quality scoring → epoch shuffle with key-derived
    shards → verified export; and the multimodal leg: AVI/MJPEG frame
    decode → per-frame resize through the progressive-capable JPEG
    decoder. One invariant per stage."""
    import numpy as np

    from electrician_spark import multimodal as mm
    from electrician_spark.functions.text import c4_filter
    from electrician_spark.io import (
        read_table,
        verify_training_shards,
        write_training_shards,
    )
    from electrician_spark.operators import classifier as qc
    from electrician_spark.operators.sampling import deterministic_shuffle
    from tests.conftest import SF_SMOKE

    # 1. C4 cleaning over planted sentence/line structure (the fixture
    # corpus is punctuation-free word soup — cut it into 6-word
    # period-terminated lines first): junk lines drop, pages below
    # three sentences drop, survivors keep clean text
    docs = read_table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        F.regexp_replace(
            "text", r"(\w+ \w+ \w+ \w+ \w+ \w+) ", "$1.\n"
        ).alias("text"),
    )
    planted = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit("\nclick here now\nMenu Home About"))
    )
    cleaned = c4_filter(planted, min_words_per_line=3, min_sentences=3)
    n_clean = cleaned.count()
    assert 0 < n_clean <= docs.count()
    assert cleaned.filter(F.col("text").contains("Menu Home About")).count() == 0

    # 2. model-based quality scoring: train on synthetic labels (clean
    # fixture text vs keyword-stuffed junk), score the cleaned corpus —
    # every row scores in [0, 1] and the junk distribution scores lower
    good = cleaned.limit(40).select(F.lit(1.0).alias("label"), "text")
    junk = spark.createDataFrame(
        [(0.0, f"buy cheap buy cheap winner {i} click click casino casino free prize")
         for i in range(40)],
        "label double, text string",
    )
    model = qc.train_quality_classifier(good.unionByName(junk), max_iter=30)
    scored = qc.quality_scores(cleaned, model)
    s = scored.agg(F.min("quality_score"), F.max("quality_score")).first()
    assert 0.0 <= s[0] and s[1] <= 1.0
    junk_score = qc.quality_scores(
        spark.createDataFrame(
            [(1, "buy cheap winner click casino casino free prize click cheap")],
            "doc_id long, text string",
        ),
        model,
    ).first().quality_score
    assert junk_score < 0.5

    # 3. epoch shuffle: shard column is key-derived ((key·n) >> 32) and
    # the export of the SAME seed reproduces byte-identical shards
    shuffled = deterministic_shuffle(scored.select("doc_id", "text"), 4, seed=11)
    back = shuffled.select("shard", "shuffle_key").collect()
    for r in back:
        assert (r.shuffle_key * 4) >> 32 == r.shard
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    m_a = {r.shard: r.sha256 for r in write_training_shards(
        scored.select("doc_id", "text"), out_a, n_shards=3, seed=11).collect()}
    m_b = {r.shard: r.sha256 for r in write_training_shards(
        scored.select("doc_id", "text"), out_b, n_shards=3, seed=11).collect()}
    assert m_a == m_b
    assert all(r.ok for r in verify_training_shards(spark, out_a).collect())

    # 4. multimodal leg: craft an MJPEG AVI, sample frames for real,
    # then resize the first frame's decoded pixels with the exact
    # area-average kernel — mass is preserved
    from tests.test_multimodal import _avi_mjpeg, _encode_jpeg_gray

    w, h = 32, 16
    frames = [
        _encode_jpeg_gray(bytes((x * 7 + i * 13) % 256 for x in range(w * h)), w, h)
        for i in range(5)
    ]
    avi = _avi_mjpeg(frames, w, h)
    from pyspark.sql import Row

    media = spark.createDataFrame(
        [Row(media_id=1, modality="video", mime="video/x-msvideo",
             payload=bytearray(avi), source_uri="f:1")],
        mm.MEDIA_SCHEMA,
    )
    stats = mm.video_frame_stats(media, every_n=2).collect()
    assert [r.frame_idx for r in sorted(stats, key=lambda r: r.frame_idx)] == [0, 2, 4]
    assert all(r.ok == "ok" and (r.width, r.height) == (w, h) for r in stats)
    fw, fh, ch, px = mm.decode_image_pixels(frames[0])
    arr = np.frombuffer(px, dtype=np.uint8).reshape(fh, fw, ch)
    small = mm.resample_image_box(arr, 8, 4)
    assert small.shape == (4, 8, 1)
    assert abs(float(arr.mean()) - float(small.mean())) < 1.5
