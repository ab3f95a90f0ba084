"""Isolated per-query timing with the noop sink (guide §1.4): times
the computation only, not collect()/Arrow transfer, with labeled jobs.

Usage: python tools/r15_time.py q_d2_ngram_jaccard q_d3_minhash_lsh
       R15_REPS=5 python tools/r15_time.py q_bl1_bloom_decontaminate
Prints per-query median/min of R15_REPS (default 5) timed runs after
one warm-up, plus a cpu-probe anchor before and after the series.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from electrician_spark.benchvariants import resolve_variant  # noqa: E402
from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("R15_REPS", "5"))


def cpu_probe(spark) -> float:
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(1_200_000_000).select(F.max(F.xxhash64("id")).alias("s")).collect()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: r15_time.py <query> [...]")
    spark = get_session("r15-time", cpus=cpu_budget())

    # worker-pool warm-up, as bench.py does
    def _warm(pdf):
        import numpy  # noqa: F401

        return pdf

    spark.range(cpu_budget() * 4).repartition(cpu_budget()).groupBy("id").applyInPandas(
        _warm, "id long"
    ).count()

    out = {"probe_before": cpu_probe(spark)}
    for name in names:
        fn = resolve_variant(name, SF_DIR) or REGISTRY[name].spark
        timings = []
        for i in range(REPS + 1):
            spark.sparkContext.setJobDescription(f"r15-time:{name}:{i}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i:
                timings.append(dt)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(timings), 4),
            "min": round(min(timings), 4),
            "all": [round(t, 4) for t in timings],
        }
    out["probe_after"] = cpu_probe(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
