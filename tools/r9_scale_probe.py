"""One-off r9 scaling probe — SCALE.md artifacts for (a) the two r8
ceiling rows that had scale ARGUMENTS but no measurements yet (r8
verdict item 5): the Bloom decontamination stack and incremental
dedup, both on the CORPUS/INDEX axis at 1x/4x/16x; (b) the
binary-ANN tier on the QUERY-count axis (r8 verdict item 6): the r8
probe scaled the corpus (exponent 0.10) but hamming_topk is
corpus x queries by design, so this measures cost vs |Q| at a FIXED
scaled corpus for the brute broadcast form AND the cell-routed
hamming_topk_ivf form, locating the crossover the
hamming_topk_auto routing rule enforces; and (c) the r9-NEW operator
batch (tokenizer encodes under frozen artifacts, length batching,
Count-Min, the frozen-coefficient scorer, HTML extraction) so new
rows land WITH measured exponents instead of scale arguments.

Usage: python tools/r9_scale_probe.py [--mults 1,4,16] [--runs 2]
       [--qmults 10,40,160,640] [--corpus-mult 8]
Prints one JSON line; paste the tables into SCALE.md.
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


def op_bloom(spark, mult: int) -> int:
    """contamination_scores_bloom end-to-end: fixed benchmark test set
    (a slice of the BASE corpus, so planted hits exist at every mult),
    scaled corpus — build filter, probe every corpus shingle through
    the k broadcast joins, exact-verify survivors, per-doc counts."""
    from electrician_spark.operators import bloom

    docs = scaled_docs(spark, SF_DIR, mult)
    testset = (
        scaled_docs(spark, SF_DIR, 1)
        .filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", F.substring("text", 1, 160).alias("text"))
    )
    return bloom.contamination_scores_bloom(docs, testset).count()


def op_incremental(spark, mult: int) -> int:
    """incremental_dedup with the INDEX on the scale axis (the axis
    that grows for the life of a corpus): index = scaled corpus rows,
    fixed probe batch (base docs re-keyed, half exact-dup of index
    rows, half fresh) — exact probe + band probe + candidate fetch."""
    from electrician_spark.operators import incremental as inc

    index = inc.build_dedup_index(scaled_docs(spark, SF_DIR, mult))
    base = scaled_docs(spark, SF_DIR, 1).filter(F.col("doc_id") < 200)
    batch = base.select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.concat(F.lit("fresh zz"), F.col("text")))
        .alias("text"),
    )
    return inc.incremental_dedup(batch, index).count()


def hamming_query_axis(spark, corpus_mult: int, qn: int, form: str) -> int:
    """Fixed scaled corpus; |Q| = qn queries drawn deterministically.
    form='brute' -> hamming_topk (corpus x queries broadcast);
    form='ivf'   -> hamming_topk_ivf (cell-routed, nprobe=2)."""
    from electrician_spark.operators import quantize as qz

    emb = scaled_embeddings(spark, SF_DIR, corpus_mult)
    q = emb.filter(F.col("vec_id") % 1_000_003 < qn)
    if form == "brute":
        return qz.hamming_topk(emb, q, d=64, k=5).count()
    return qz.hamming_topk_ivf(emb, q, d=64, k=5, nprobe=2).count()


def op_wordpiece(spark, mult: int) -> int:
    """wordpiece_encode over a scaled corpus under a FIXED vocab — the
    token-prefix bijection makes per-replica words distinct, so the
    per-batch word cache cannot shortcut across replicas (worst case
    for the encoder)."""
    from pyspark.sql import functions as F

    from electrician_spark.functions import tokenizer as tk
    from electrician_spark.queries import _WP_FROZEN_VOCAB

    docs = scaled_docs(spark, SF_DIR, mult)
    enc = tk.wordpiece_encode(docs, list(_WP_FROZEN_VOCAB))
    return enc.agg(F.sum(F.size("pieces"))).collect()[0][0]


def op_bpe(spark, mult: int) -> int:
    """bpe_encode over a scaled corpus under the FIXED frozen merge
    list — same worst-case-cache construction as the WordPiece probe."""
    from pyspark.sql import functions as F

    from electrician_spark.functions import tokenizer as tk
    from electrician_spark.queries import _BPE_FROZEN_MERGES

    docs = scaled_docs(spark, SF_DIR, mult)
    enc = tk.bpe_encode(docs, list(_BPE_FROZEN_MERGES))
    return enc.agg(F.sum(F.size("bpe_tokens"))).collect()[0][0]


def op_length_batches(spark, mult: int) -> int:
    """length_batches + padding audit on the scaled corpus: one hash
    exchange on the md5 shard, per-shard window sort."""
    from pyspark.sql import functions as F

    from electrician_spark.operators import packing

    docs = scaled_docs(spark, SF_DIR, mult).withColumn(
        "n_chars", F.length("text")
    )
    b = packing.length_batches(docs, 16, "n_chars", n_shards=32, seed=3)
    return packing.length_batch_stats(b, "n_chars").count()


def op_count_min(spark, mult: int) -> int:
    """count_min_build over a scaled stream + a fixed probe set: the
    sketch stays <= depth*width cells no matter the input size, so the
    exchange is constant and only the linear scan grows."""
    from pyspark.sql import functions as F

    from electrician_spark.operators import sketch as sk

    docs = scaled_docs(spark, SF_DIR, mult).select(
        (F.col("doc_id") % 4096).cast("string").alias("key")
    )
    cm = sk.count_min_build(docs, "key", width=1024, depth=4)
    probes = scaled_docs(spark, SF_DIR, 1).select(
        (F.col("doc_id") % 4096).cast("string").alias("key")
    ).distinct()
    return sk.count_min_estimate(probes, cm, "key").count()


def op_linear_scores(spark, mult: int) -> int:
    """Frozen-coefficient linear scorer over the scaled corpus: one
    per-row fold riding the scan, zero shuffle."""
    from pyspark.sql import functions as F

    from electrician_spark.operators.classifier import linear_scores
    from electrician_spark.queries import _FC_BIAS, _FC_WEIGHTS

    docs = scaled_docs(spark, SF_DIR, mult)
    return linear_scores(docs, _FC_WEIGHTS, bias=_FC_BIAS).filter(
        F.col("quality_keep")
    ).count()


def op_html_extract(spark, mult: int) -> int:
    """HTML main-content extraction over pages synthesized from the
    scaled corpus — the q_hx1 page template, regex-bound per row."""
    from pyspark.sql import functions as F

    from electrician_spark.functions import html as hx

    docs = scaled_docs(spark, SF_DIR, mult)
    page = F.concat(
        F.lit('<html><head><title>T</title><script>var x = 1;</script></head>'
              '<body><nav><a href="/">Home</a> <a href="/b">B</a></nav><p>'),
        F.substring(F.col("text"), 1, 400),
        F.lit('</p><div><a href="/x">click here now</a></div><p>tiny</p><p>'),
        F.substring(F.col("text"), 401, 400),
        F.lit("</p></body></html>"),
    )
    pages = docs.select("doc_id", page.alias("html"))
    return hx.extract_main_text(pages).filter(F.col("n_good_blocks") > 0).count()


CORPUS_OPS = {
    "q_bl1_bloom_decontaminate": op_bloom,
    "q_id1_incremental_dedup": op_incremental,
    "q_wp1_wordpiece_encode": op_wordpiece,
    "q_bp1_bpe_encode": op_bpe,
    "q_lb1_length_batches": op_length_batches,
    "q_cm1_count_min": op_count_min,
    "q_fc1_frozen_linear_scores": op_linear_scores,
    "q_hx1_html_main_text": op_html_extract,
}


def _timed(fn, runs: int):
    timings, rows = [], None
    for i in range(runs + 1):  # first run warms
        t0 = time.perf_counter()
        rows = fn()
        dt = time.perf_counter() - t0
        if i:
            timings.append(dt)
    return round(statistics.median(timings), 2), rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,4,16")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--qmults", default="10,40,160,640")
    ap.add_argument("--corpus-mult", type=int, default=8)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    qns = [int(m) for m in args.qmults.split(",")]

    spark = get_session("r9-scale-probe", cpus=cpu_budget())
    out: dict = {"sf_dir": SF_DIR, "mults": mults, "runs": args.runs, "ops": {}}

    only = set(args.only.split(",")) if args.only else None
    for name, fn in CORPUS_OPS.items():
        if only and name not in only:
            continue
        rec: dict = {"seconds": {}, "rows": {}}
        for mult in mults:
            sec, rows = _timed(lambda: fn(spark, mult), args.runs)
            rec["seconds"][str(mult)] = sec
            rec["rows"][str(mult)] = rows
        lo, hi = str(mults[0]), str(mults[-1])
        ratio = rec["seconds"][hi] / rec["seconds"][lo]
        rec["exponent"] = round(math.log(ratio) / math.log(mults[-1] / mults[0]), 3)
        out["ops"][name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)

    if only is None or {"hamming_brute", "hamming_ivf"} & only:
        qaxis: dict = {"corpus_mult": args.corpus_mult, "qns": qns}
        for form in ("brute", "ivf"):
            if only and f"hamming_{form}" not in only:
                continue
            rec = {"seconds": {}, "rows": {}}
            for qn in qns:
                sec, rows = _timed(
                    lambda: hamming_query_axis(spark, args.corpus_mult, qn, form),
                    args.runs,
                )
                rec["seconds"][str(qn)] = sec
                rec["rows"][str(qn)] = rows
            lo, hi = str(qns[0]), str(qns[-1])
            ratio = rec["seconds"][hi] / rec["seconds"][lo]
            rec["exponent"] = round(math.log(ratio) / math.log(qns[-1] / qns[0]), 3)
            qaxis[form] = rec
            print(f"# hamming_{form} (query axis): {rec}", file=sys.stderr)
        out["hamming_query_axis"] = qaxis

    print(json.dumps(out))


if __name__ == "__main__":
    main()
