"""One-off r8 scaling probe — SCALE.md artifacts for the four r7/r8
operators that had scale ARGUMENTS but no scale MEASUREMENTS yet
(r7 verdict item 6): DSIR selection, bigram Stupid-Backoff LM
bucketing, IVF-PQ ADC search, and the robots.txt URL gate.

Reuses the proven replica-scaling constructions from scale_probe.py
(token-prefix bijection for text — per-replica shingle/ngram spaces
stay disjoint so model sizes grow with the corpus; orthogonal
rotation+sign for embeddings — neighbor structure replicates exactly)
and times each operator end-to-end at 1x / 4x / 16x, reporting the
fitted wall-time exponent log(t16/t1)/log(16).

Usage: python tools/r8_scale_probe.py [--mults 1,4,16] [--runs 2]
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import scaled_docs, scaled_embeddings  # noqa: E402

from electrician_spark.session import cpu_budget, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def op_dsir(spark, mult: int) -> int:
    """dsir_select end-to-end: fit target+raw hashed-ngram models,
    broadcast-score, Gumbel top-k. Target set stays fixed-size
    (doc_id % 20 of the base corpus); raw corpus scales."""
    from electrician_spark.operators import dsir

    docs = scaled_docs(spark, SF_DIR, mult)
    target = docs.filter(F.col("doc_id") % 20 == 0).limit(250)
    return dsir.dsir_select(docs, target, k=100).count()


def op_lm2(spark, mult: int) -> int:
    """Bigram Stupid-Backoff fit on a fixed reference slice + scoring
    of the scaled corpus + approxQuantile buckets — the q_lm2 shape."""
    from electrician_spark.operators import lmquality as lm

    docs = scaled_docs(spark, SF_DIR, mult)
    ref = docs.filter(F.col("doc_id") % 10 == 0)
    uni, big = lm.bigram_lm(ref, vocab_size=2000, max_bigrams=20000, alpha=0.5)
    scored = lm.lm_score_bigram(docs, uni, big, backoff=0.4).select(
        "doc_id", "n_tokens", F.round("pseudo_perplexity", 6).alias("perplexity")
    )
    return (
        lm.perplexity_buckets(scored, n_buckets=3)
        .groupBy("bucket").count().count()
    )


def op_ivfpq(spark, mult: int) -> int:
    """IVF-PQ: train codebooks on a fixed sample, encode the scaled
    corpus, ADC top-k for a fixed query set — the q_pq2 shape."""
    from electrician_spark.operators import quantize as qz

    emb = scaled_embeddings(spark, SF_DIR, mult)
    books = qz.pq_train(emb, vec_col="embedding", m=4, k=4, iters=1, id_col="vec_id")
    codes = qz.pq_encode(emb, books, vec_col="embedding")
    q = emb.filter(F.col("vec_id") < 10)
    return qz.ivfpq_topk(
        codes, q, books, k=5, nprobe=1,
        id_col="vec_id", vec_col="embedding", label_col="label",
    ).count()


def op_robots(spark, mult: int) -> int:
    """robots_allowed over a scaled URL table (documents-derived paths,
    the q_rb1 shapes) against a fixed 10-host compiled-rule table."""
    from electrician_spark.operators import robots as rb

    even_body = (
        "User-agent: trainbot\nDisallow: /private/\nAllow: /private/doc\n"
        "Disallow: /*?sessionid=\n\nUser-agent: *\nDisallow: /\n"
    )
    odd_body = "User-agent: *\nDisallow: /tmp/*\nAllow: /tmp/x$\nDisallow: /search\n"
    hosts = spark.createDataFrame(
        [(f"h{i}.example.com", even_body if i % 2 == 0 else odd_body) for i in range(10)],
        "host string, body string",
    )
    rules = rb.robots_rules(rb.parse_robots(hosts))
    docs = scaled_docs(spark, SF_DIR, mult).select("doc_id")
    d = F.col("doc_id")
    shape = d % 5
    path = (
        F.when(shape == 0, F.concat(F.lit("/private/doc"), d.cast("string")))
        .when(shape == 1, F.concat(F.lit("/public/doc"), d.cast("string")))
        .when(shape == 2, F.concat(F.lit("/tmp/x"), d.cast("string")))
        .when(shape == 3, F.concat(F.lit("/page?sessionid="), d.cast("string")))
        .otherwise(F.concat(F.lit("/search"), d.cast("string")))
    )
    urls = docs.withColumn(
        "url",
        F.concat(F.lit("http://h"), (d % 10).cast("string"), F.lit(".example.com"), path),
    )
    out = rb.robots_allowed(urls, rules, agent="trainbot")
    return out.filter(~F.col("allowed")).count()


def op_hamming(spark, mult: int) -> int:
    """Binary-quantization tier: sign-bit encode the scaled corpus +
    hamming_rerank_topk for a fixed query set (prefilter 4x, exact
    re-rank) — the full tier stack end to end."""
    from pyspark.sql import functions as F

    from electrician_spark.operators import quantize as qz

    emb = scaled_embeddings(spark, SF_DIR, mult)
    q = emb.filter(F.col("vec_id") < 10)
    return qz.hamming_rerank_topk(emb, q, d=64, k=5, prefilter_factor=4).count()


OPS = {
    "q_ir1_dsir_select": op_dsir,
    "q_lm2_bigram_buckets": op_lm2,
    "q_pq2_ivfpq_topk": op_ivfpq,
    "q_rb1_robots_gate": op_robots,
    "hamming_rerank_topk": op_hamming,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,4,16")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    spark = get_session("r8-scale-probe", cpus=cpu_budget())
    out = {"sf_dir": SF_DIR, "mults": mults, "runs": args.runs, "ops": {}}
    for name, fn in OPS.items():
        rec = {"seconds": {}, "rows": {}}
        for mult in mults:
            timings = []
            rows = None
            for i in range(args.runs + 1):  # first run warms
                t0 = time.perf_counter()
                rows = fn(spark, mult)
                dt = time.perf_counter() - t0
                if i:
                    timings.append(dt)
            rec["seconds"][str(mult)] = round(statistics.median(timings), 2)
            rec["rows"][str(mult)] = rows
        lo, hi = str(mults[0]), str(mults[-1])
        ratio = rec["seconds"][hi] / rec["seconds"][lo]
        rec["exponent"] = round(math.log(ratio) / math.log(mults[-1] / mults[0]), 3)
        out["ops"][name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
