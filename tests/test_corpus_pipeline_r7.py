"""End-to-end composition of the late-r7 operator batch on real
fixtures: canonical-URL keys → bloom-prefiltered decontamination →
DSIR target-likeness selection → incremental dedup vs a prior-snapshot
index → pHash near-dup clustering of attached media. Every stage is an
already-unit-pinned operator; this test pins that they COMPOSE (schema
contracts, column hygiene, determinism end to end)."""

from pyspark.sql import functions as F

from electrician_spark import multimodal as mm
from electrician_spark.functions import url as u
from electrician_spark.operators import bloom, dedup, dsir, incremental

SF = "/root/testdata/sf0.001"


def test_curation_pipeline_with_history(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # 1. synthesize per-doc URLs with click noise; canonicalize and
    # keep one doc per canonical key (URL-level crawl dedup)
    with_urls = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://www.site-"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".com/p/"),
            (F.col("doc_id") % 100).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("?utm_source=feed")).otherwise(
                F.lit("")
            ),
        ),
    ).withColumn("curl", u.canonical_url(F.col("url")))
    url_deduped = dedup.exact_dedup(
        with_urls, text_col="curl", keep_col="doc_id"
    )
    n_url = url_deduped.count()
    assert n_url == 100  # 50 sites × 2 paths... = 100 distinct canonical keys
    assert url_deduped.filter(F.col("curl").contains("utm_")).count() == 0

    # 2. bloom-prefiltered decontamination against a planted test set
    testset = docs.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id", F.substring("text", 1, 200).alias("text")
    )
    scores = bloom.contamination_scores_bloom(
        url_deduped, testset, m_bits=1 << 14, k=4
    )
    contaminated = scores.filter(F.col("containment") >= 0.2).select("doc_id")
    clean = url_deduped.join(contaminated, "doc_id", "left_anti")
    assert contaminated.count() > 0  # planted overlap really detected
    assert clean.count() == n_url - contaminated.count()

    # 3. DSIR: keep the 30 most target-like (en-like) survivors
    target = docs.filter(F.col("lang") == "en")
    selected = dsir.dsir_select(
        clean.filter(F.col("lang") != "en"), target, k=30, n_buckets=1024, seed=3
    )
    assert selected.count() == 30
    picked = clean.join(selected.select("doc_id"), "doc_id", "left_semi")

    # 4. incremental dedup vs a prior-snapshot index (odd docs were
    # "already admitted"): survivors must not duplicate history
    history = incremental.build_dedup_index(
        docs.filter(F.col("doc_id") % 2 == 1)
    ).localCheckpoint()
    res = incremental.incremental_dedup(picked, history)
    admitted = res.filter(F.col("dup_kind").isNull())
    # every odd selected doc IS its own historical twin -> exact dup
    # (even docs may ALSO fall to planted exact/near corpus dups)
    odd = {r.doc_id for r in picked.filter(F.col("doc_id") % 2 == 1).select("doc_id").collect()}
    kinds = {r.doc_id: r.dup_kind for r in res.select("doc_id", "dup_kind").collect()}
    assert all(kinds[d] == "exact" for d in odd)
    assert admitted.count() >= 1
    assert admitted.count() + sum(1 for k in kinds.values() if k is not None) == 30

    # 5. attach synthetic media to the admitted docs; pHash + banded
    # hamming clusters: same-structure images collide at distance 0
    ids = admitted.select("doc_id")

    def synth(batches):
        import pandas as pd

        from electrician_spark import multimodal as m

        for b in batches:
            mids, payloads = [], []
            for did in b["doc_id"]:
                did = int(did)
                if did % 3 == 0:
                    payloads.append(
                        m.synth_png_gray_split(32, 32, 200, 60, vertical=True)
                    )
                else:
                    payloads.append(m.synth_png_gray(32, 32, 40 + did % 100))
                mids.append(did)
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    media = ids.mapInPandas(synth, "media_id long, payload binary")
    sig = mm.image_phash(media).select("media_id", "phash")
    pairs = dedup.hamming_pairs(sig, "media_id", "phash", max_hamming=0)
    # distance-0 pairs = within {solids} and within {splits}
    n_split = admitted.filter(F.col("doc_id") % 3 == 0).count()
    n_solid = admitted.count() - n_split
    expect = n_solid * (n_solid - 1) // 2 + n_split * (n_split - 1) // 2
    assert pairs.count() == expect
    assert pairs.filter(F.col("hamming") != 0).count() == 0

    # determinism: the whole pipeline re-runs to the same admitted set
    again = incremental.incremental_dedup(picked, history).filter(
        F.col("dup_kind").isNull()
    )
    assert sorted(r.doc_id for r in again.select("doc_id").collect()) == sorted(
        r.doc_id for r in admitted.select("doc_id").collect()
    )
