"""Corpus-axis scale check on the REAL heavy rows (r9 verdict item 6).

The r9 probe exponents for the heavy extras family (bloom 0.20,
incremental-index 0.33, …) were measured on dedicated harnesses; this
probe re-measures the exponents on the actual REGISTRY rows by running
them unchanged on synthetic documents/embeddings tables generated at
1x (matching sf0.1 row counts: 5 000 docs / 2 000 vectors) and 4x by
the SAME closed-form md5 generator, so the only thing that changes
between the two points is corpus size. exponent = log4(t_4x / t_1x).

q_id1 is measured through the incremental operators directly (the
registry row pins doc_id <= 900 for oracle-size reasons, which would
hide the corpus axis).

Usage: python tools/r10_corpus_scale_probe.py  (results -> stdout;
recorded in SCALE.md bench-series notes)
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import get_session  # noqa: E402

BASE_DOCS = 5_000
BASE_VECS = 2_000
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "window order data column join small line customer query group big "
    "vector stream filter sort the a"
).split()


def synth_dir(spark, root: str, mult: int) -> str:
    out = os.path.join(root, f"sx{mult}")
    if os.path.isdir(os.path.join(out, "documents.parquet")):
        return out
    n_docs, n_vecs = BASE_DOCS * mult, BASE_VECS * mult
    d = F.col("id")
    h = lambda s: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(d.cast("string"), F.lit(s))), 1, 8), 16, 10
    ).cast("long")
    n_tok = (F.lit(20) + h("len") % 60).cast("int")

    def word(j):
        hh = F.conv(
            F.substring(
                F.md5(F.concat(d.cast("string"), F.lit("_"), j.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        return F.element_at(
            F.array(*[F.lit(w) for w in VOCAB]), (hh % len(VOCAB) + 1).cast("int")
        )

    text = F.array_join(F.transform(F.sequence(F.lit(0), n_tok - 1), word), " ")
    docs = spark.range(n_docs).select(
        d.alias("doc_id"),
        text.alias("text"),
        F.when(h("lang") % 5 == 0, "de").when(h("lang") % 5 == 1, "fr").otherwise("en").alias("lang"),
        F.concat(F.lit("src"), (h("src") % 4).cast("string")).alias("source"),
    )
    docs = docs.withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    def dim(j):
        hh = F.conv(
            F.substring(
                F.md5(F.concat(d.cast("string"), F.lit("~"), j.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        return ((hh % 2001).cast("float") / 1000.0 - 1.0).cast("float")

    emb = spark.range(n_vecs).select(
        d.alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(63)), dim).alias("embedding"),
        (h("lb") % 8).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    return out


def timed(thunk, runs: int = 3) -> float:
    t = []
    for i in range(runs + 1):  # first = warm-up
        t0 = time.perf_counter()
        thunk()
        if i:
            t.append(time.perf_counter() - t0)
    return round(statistics.median(t), 4)


def q_id1_uncapped(spark, sf_dir):
    from electrician_spark.io import read_table
    from electrician_spark.operators import incremental

    docs = read_table(spark, sf_dir, "documents")
    index = incremental.build_dedup_index(docs.filter(F.col("doc_id") % 3 != 0))
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    return incremental.incremental_dedup(batch, index)


def main() -> None:
    import tempfile

    spark = get_session(
        "r10-corpus-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )

    def _warm(pdf):
        import numpy  # noqa: F401

        return pdf

    spark.range(128).repartition(32).groupBy("id").applyInPandas(_warm, "id long").count()

    mults = tuple(
        int(x) for x in os.environ.get("SCALE_MULTS", "1,4").split(",")
    )
    root = tempfile.mkdtemp(prefix="r10scale_")
    dirs = {m: synth_dir(spark, root, m) for m in mults}

    rows = {
        "q_bl1_bloom_decontaminate": REGISTRY["q_bl1_bloom_decontaminate"].spark,
        "q_id1_incremental_dedup(uncapped)": q_id1_uncapped,
        "q_bq1_binary_hamming_tier": REGISTRY["q_bq1_binary_hamming_tier"].spark,
        "q_ir1_dsir_select": REGISTRY["q_ir1_dsir_select"].spark,
        "q_lm2_bigram_buckets": REGISTRY["q_lm2_bigram_buckets"].spark,
        # r11 (r10 verdict item 3): the four r10-new heavy rows, run
        # UNCHANGED on the same synthetic corpora so their bench cost
        # can be attributed fixed-overhead vs corpus-tracking.
        "q_ug1_unigram_viterbi_encode": REGISTRY["q_ug1_unigram_viterbi_encode"].spark,
        # r11-new heavy rows, probed the round they land (the r10-new
        # rows went one round without a probe point and got flagged)
        "q_li1_langid_model": REGISTRY["q_li1_langid_model"].spark,
        "q_em1_unigram_hard_em": REGISTRY["q_em1_unigram_hard_em"].spark,
        "q_sx1_suffix_array_order": REGISTRY["q_sx1_suffix_array_order"].spark,
        "q_lr1_longest_repeated_run": REGISTRY["q_lr1_longest_repeated_run"].spark,
        "q_sa1_suffix_spans": REGISTRY["q_sa1_suffix_spans"].spark,
        # r12-new corpus-heavy row, probed the round it lands (standing
        # protocol). The other three r12 rows are fixture-bounded
        # (q_se1 600 orders / q_sj1 12 events / q_pb1 500 envelopes) —
        # no corpus axis to probe.
        "q_x9_trained_gate_pipeline": REGISTRY["q_x9_trained_gate_pipeline"].spark,
        # r14-new corpus-heavy row, probed the round it lands (standing
        # protocol). The other two r14 rows are fixture-bounded (q_kc1
        # produces/consumes a closed-form 800-row events slice; q_sk2
        # joins the orders fixture and its scale posture is the
        # plan-pinned salt spread) — no corpus axis to probe.
        "q_ac1_blocklist_scan": REGISTRY["q_ac1_blocklist_scan"].spark,
    }
    only = os.environ.get("SCALE_ROWS")
    if only:
        keep = {s.strip() for s in only.split(",")}
        rows = {k: v for k, v in rows.items() if any(s in k for s in keep)}
    # count() is the wrong action for plans whose FINAL operators are
    # cardinality-preserving windows: Catalyst prunes the unused window
    # columns and the probe times a plan with NO Window operator at all
    # (caught r12 — q_sx1's compact regime measured 0.9 s phantom vs
    # 2.8 s real). A noop-format write materializes every column with
    # zero driver transfer. Aggregation-ending rows keep count() so
    # their recorded cross-round exponent bases stay comparable
    # (count cannot prune through a groupBy — it changes cardinality).
    _NOOP_ROWS = {"q_sx1_suffix_array_order"}

    def _action(name, df):
        if name in _NOOP_ROWS:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    lo, hi = mults[0], mults[-1]
    for name, fn in rows.items():
        ts = {m: timed(lambda m=m: _action(name, fn(spark, dirs[m]))) for m in mults}
        exp = (
            math.log(ts[hi] / ts[lo]) / math.log(hi / lo)
            if ts[lo] > 0 and hi > lo
            else float("nan")
        )
        pts = " ".join(f"{m}x={ts[m]}s" for m in mults)
        print(f"{name}: {pts} exponent={exp:.2f}", flush=True)


if __name__ == "__main__":
    main()
