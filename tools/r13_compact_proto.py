"""Prototype timing: compact-regime candidate plans for q_d2/q_d3 at
sf0.1 (5k docs). Goal: find Spark's floor when the plan minimizes
exchanges/jobs (broadcast self-join, carried sizes), vs the DuckDB
oracle, same session interleaved."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from electrician_spark.functions import text as tx  # noqa: E402
from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sh(spark, fan_out=False):
    docs_t = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        F.col("doc_id").alias("_id"), "text"
    )
    if fan_out:
        from electrician_spark.io import fan_out_small

        docs_t = fan_out_small(docs_t)
    base = docs_t.select("_id", tx.tokens(F.col("text")).alias("_tk"))
    return base.select(
        "_id", F.explode(tx.shingles_from_tokens(F.col("_tk"), 3)).alias("_s")
    )


def d2_compact_arrays(spark, fan_out=False):
    sh = _sh(spark, fan_out)
    docs = sh.groupBy("_id").agg(
        F.array_sort(F.collect_list("_s")).alias("_arr"), F.count("*").alias("_sz")
    )
    a = docs.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"), F.explode("_arr").alias("_s")
    )
    b = docs.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"), F.explode("_arr").alias("_s")
    )
    inter = (
        a.join(F.broadcast(b), "_s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_sza", "_szb")
        .agg(F.count("*").alias("_i"))
    )
    jac = inter.select(
        "id_a",
        "id_b",
        F.round(F.col("_i") / (F.col("_sza") + F.col("_szb") - F.col("_i")), 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.8)
    return jac.orderBy("id_a", "id_b")


def d2_compact_naive(spark, fan_out=False):
    sh = _sh(spark, fan_out)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_sz"))
    inter = (
        sh.select(F.col("_id").alias("id_a"), "_s")
        .join(F.broadcast(sh.select(F.col("_id").alias("id_b"), "_s")), "_s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_i"))
    )
    jac = (
        inter.join(F.broadcast(sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"))), "id_a")
        .join(F.broadcast(sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"))), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("_i") / (F.col("_sza") + F.col("_szb") - F.col("_i")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )
    return jac.orderBy("id_a", "id_b")


def _minhash_aggs(k):
    return [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("_s")))).alias(f"h{i}") for i in range(k)
    ]


def d3_compact(spark, fan_out=False):
    num_hashes, bands, threshold = 16, 4, 0.8
    rows_per_band = num_hashes // bands
    sh = _sh(spark, fan_out)
    sigs = sh.groupBy("_id").agg(*_minhash_aggs(num_hashes))
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bh"))
        )
    buckets = sigs.select("_id", F.explode(F.array(*band_cols)).alias("b")).select(
        "_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    cand = (
        buckets.select(F.col("_id").alias("id_a"), "band", "bh")
        .join(F.broadcast(buckets.select(F.col("_id").alias("id_b"), "band", "bh")), ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    docs = sh.groupBy("_id").agg(
        F.array_sort(F.collect_list("_s")).alias("_arr"), F.count("*").alias("_sz")
    )
    a = docs.select(F.col("_id").alias("id_a"), F.col("_arr").alias("_aa"), F.col("_sz").alias("_sza"))
    b2 = docs.select(F.col("_id").alias("id_b"), F.col("_arr").alias("_ab"), F.col("_sz").alias("_szb"))
    inter = F.size(F.array_intersect(F.col("_aa"), F.col("_ab")))
    out = (
        cand.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b2), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / (F.col("_sza") + F.col("_szb") - inter), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.orderBy("id_a", "id_b")


def main():
    spark = get_session("r13-compact-proto", cpus=cpu_budget())
    con = duckdb.connect()
    con.execute(f"SET threads={cpu_budget()}")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{os.path.join(SF_DIR, 'documents.parquet')}'"
    )
    oracles = {
        "d2": REGISTRY["q_d2_ngram_jaccard"].oracle,
        "d3": REGISTRY["q_d3_minhash_lsh"].oracle,
    }

    variants = [
        ("d2/arrays", lambda: d2_compact_arrays(spark)),
        ("d2/arrays+fan", lambda: d2_compact_arrays(spark, fan_out=True)),
        ("d2/naive", lambda: d2_compact_naive(spark)),
        ("d3/compact", lambda: d3_compact(spark)),
        ("d3/compact+fan", lambda: d3_compact(spark, fan_out=True)),
    ]

    # correctness vs oracle
    for label, fn in variants:
        rows = [(r[0], r[1], round(float(r[2]), 6)) for r in fn().collect()]
        key = label.split("/")[0]
        orows = [(r[0], r[1], round(float(r[2]), 6)) for r in con.execute(oracles[key]).fetchall()]
        assert rows == orows, (label, len(rows), len(orows), rows[:2], orows[:2])
        print(f"{label}: oracle-identical ({len(rows)} pairs)", flush=True)

    series = {}
    reps = int(os.environ.get("AB_REPS", "3"))
    for rep in range(reps + 1):
        for label, fn in variants:
            t0 = time.perf_counter()
            fn().collect()
            dt = time.perf_counter() - t0
            if rep:
                series.setdefault(label, []).append(dt)
        for key, sql in oracles.items():
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            if rep:
                series.setdefault(f"oracle/{key}", []).append(dt)

    for k, v in series.items():
        print(f"{k}: median={statistics.median(v):.3f}s runs={[round(x, 3) for x in v]}")
    for key in ("d2", "d3"):
        om = statistics.median(series[f"oracle/{key}"])
        for k in series:
            if k.startswith(key + "/"):
                print(f"ratio {k} vs oracle: {statistics.median(series[k]) / om:.2f}x")


if __name__ == "__main__":
    main()
