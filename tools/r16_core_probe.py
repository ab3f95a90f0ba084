"""r16 verdict item 2: core-scaling reading on the 16x/64x growth
corpora — run once per core count (SPARK_GRAFT_CPUS) and ratio the
lines. bench.py emits the same 16x measurement as an additive
`core_scaling` JSON line; this standalone probe is how the committed
64x ratios in CORE_SCALING_r16.json / SCALE.md were captured.

Usage: SPARK_GRAFT_CPUS=32 python tools/r16_core_probe.py /tmp/r16growth/g64
       SPARK_GRAFT_CPUS=8  python tools/r16_core_probe.py /tmp/r16growth/g64
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402


def main() -> None:
    gdir = sys.argv[1]
    spark = get_session("r16-core-probe", cpus=cpu_budget())

    def _warm(pdf):
        return pdf

    spark.range(64).repartition(32).groupBy("id").applyInPandas(_warm, "id long").count()
    for name in ("q_d2_ngram_jaccard", "q_d3_minhash_lsh", "q_d4_simhash"):
        fn = REGISTRY[name].spark
        ts = []
        for i in range(3):  # warm-up + 2
            t0 = time.perf_counter()
            fn(spark, gdir).collect()
            if i:
                ts.append(time.perf_counter() - t0)
        print(
            f"{name} cpus={cpu_budget()}: median={statistics.median(ts):.3f} "
            f"runs={[round(x, 3) for x in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
