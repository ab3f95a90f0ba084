"""Profile the primitives under q_d2/q_d3 at sf0.1: where do the
seconds actually go?"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from electrician_spark.functions import text as tx  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_session("r13-prim", cpus=cpu_budget())
    path = os.path.join(SF_DIR, "documents.parquet")

    def docs_t():
        return spark.read.parquet(path).select(F.col("doc_id").alias("_id"), "text")

    def sh(fan=False):
        d = docs_t()
        if fan:
            from electrician_spark.io import fan_out_small

            d = fan_out_small(d)
        base = d.select("_id", tx.tokens(F.col("text")).alias("_tk"))
        return base.select(
            "_id", F.explode(tx.shingles_from_tokens(F.col("_tk"), 3)).alias("_s")
        )

    def docs_arr(fan=False):
        return sh(fan).groupBy("_id").agg(
            F.array_sort(F.collect_list("_s")).alias("_arr"), F.count("*").alias("_sz")
        )

    probes = {
        "scan-only": lambda: docs_t(),
        "tokenize": lambda: docs_t().select("_id", tx.tokens(F.col("text")).alias("_tk")),
        "shingle-explode": lambda: sh(),
        "shingle-explode+fan": lambda: sh(True),
        "shingle+md5x16": lambda: sh(True).select(
            "_id", *[F.md5(F.concat(F.lit(f"{i}:"), F.col("_s"))).alias(f"m{i}") for i in range(16)]
        ),
        "docs-arrays": lambda: docs_arr(),
        "docs-arrays+fan": lambda: docs_arr(True),
        "sigs16+fan": lambda: sh(True).groupBy("_id").agg(
            *[F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("_s")))).alias(f"h{i}") for i in range(16)]
        ),
        "empty-job": lambda: spark.range(10),
    }

    n, = spark.read.parquet(path).count(),
    sh_n = sh(True).count()
    print(f"docs={n} shingle_rows={sh_n}", flush=True)

    series = {}
    for rep in range(4):
        for label, fn in probes.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if rep:
                series.setdefault(label, []).append(dt)
    for k, v in series.items():
        print(f"{k}: median={statistics.median(v):.3f}s runs={[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
