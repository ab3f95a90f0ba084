"""End-to-end composition of the r8 operator batch on real fixtures:
NFKC normalization → extended PII scrub → robots URL gate →
deterministic corpus split → length-grouped batching on the train
split, plus the binary-quantization ANN tier and the one-pass
perceptual-hash family on the media side. Every stage is unit-pinned;
this pins that they COMPOSE (schema contracts, column hygiene,
determinism end to end)."""

from pyspark.sql import functions as F

from electrician_spark import multimodal as mm
from electrician_spark.functions import text as tx
from electrician_spark.operators import packing, quantize, robots as rb, sampling

SF = "/root/testdata/sf0.001"


def test_r8_text_curation_chain(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # 1. normalize + scrub riding one projection (both pure/Arrow ops)
    clean = docs.select(
        "doc_id",
        "lang",
        tx.redact_pii_extended(tx.nfkc_normalize(F.col("text"))).alias("text"),
    )
    assert clean.count() == docs.count()
    assert clean.filter(F.col("text").rlike("[0-9]{9,}")).count() == 0

    # 2. robots gate over synthesized per-doc URLs (the q_rb1 policy)
    hosts = spark.createDataFrame(
        [("site.example.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, body string",
    )
    rules = rb.robots_rules(rb.parse_robots(hosts))
    with_urls = clean.withColumn(
        "url",
        F.concat(
            F.lit("http://site.example.com/"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("private/")).otherwise(F.lit("p/")),
            F.col("doc_id").cast("string"),
        ),
    )
    gated = rb.robots_allowed(with_urls, rules).filter(F.col("allowed"))
    n_docs = docs.count()
    n_blocked = docs.filter(F.col("doc_id") % 4 == 0).count()
    assert gated.count() == n_docs - n_blocked

    # 3. deterministic split; 4. length batching on the train split
    split = sampling.split_corpus(gated, {"train": 0.9, "val": 0.1})
    train = split.filter(F.col("split") == "train").withColumn(
        "n_tokens", tx.token_count(F.col("text"))
    )
    batched = packing.length_batches(train, 8, "n_tokens", n_shards=2)
    stats = packing.length_batch_stats(batched, "n_tokens")
    # batches are tight: median padding waste well under random-order
    med = stats.approxQuantile("pad_frac", [0.5], 0.0)[0]
    assert med < 0.2
    # composition is deterministic end to end
    a = sorted(
        (r.doc_id, r.split, r.shard, r.batch_id, r.pos)
        for r in packing.length_batches(train, 8, "n_tokens", n_shards=2).collect()
    )
    b = sorted(
        (r.doc_id, r.split, r.shard, r.batch_id, r.pos)
        for r in packing.length_batches(train, 8, "n_tokens", n_shards=2).collect()
    )
    assert a == b


def test_r8_media_and_embedding_tiers(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    # binary tier stack returns the cosine_topk surface and k rows/query
    out = quantize.hamming_rerank_topk(emb, q, d=64, k=3, prefilter_factor=8)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4} and all(len(v) == 3 for v in per_q.values())
    for v in per_q.values():
        coss = [r.cos for r in sorted(v, key=lambda r: r.rank)]
        assert coss == sorted(coss, reverse=True)

    # one-pass hash family over synthesized media payloads
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)

    def synth(batches):
        import pandas as pd

        from electrician_spark import multimodal as m

        for b in batches:
            ids, payloads = [], []
            for did in b["doc_id"]:
                did = int(did)
                ids.append(did)
                payloads.append(m.synth_png_gray(16, 16, (did * 31) % 256))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").mapInPandas(synth, "media_id long, payload binary")
    hashes = mm.image_perceptual_hashes(media).collect()
    assert len(hashes) == 20 and all(r.ok == "ok" for r in hashes)
    # solid images: aHash/dHash exactly 0, pHash the DC-only pattern
    assert all(r.ahash == 0 and r.dhash == 0 for r in hashes)
    # DC-only pattern (1) — except the all-black solid whose DC is 0
    assert {r.phash for r in hashes} <= {0, 1}
