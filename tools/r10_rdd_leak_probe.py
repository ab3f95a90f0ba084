"""Find which bench-series row leaves a persistent RDD alive at series
end (r9 verdict item 4: BENCH_DETAIL sha_diag shows persistent_rdds: 1
surviving an explicit driver+JVM GC). Runs the same query set as
bench.py at a small SF; after each query, drops the Python refs, GCs
both runtimes, waits for the ContextCleaner, and lists any RDD still
registered as persistent (id, name, cached partitions)."""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import get_session  # noqa: E402
from bench import EXTRA_QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def persistent(sc):
    infos = sc._jsc.sc().getRDDStorageInfo()
    return [
        (i.id(), i.name(), i.numCachedPartitions())
        for i in infos
    ]


def main() -> None:
    spark = get_session("rdd-leak-probe", cpus=8)
    sc = spark.sparkContext
    names = [n for n, q in REGISTRY.items() if q.bench]
    names += [n for n in EXTRA_QUERIES if n in REGISTRY]
    baseline: set[int] = set()
    for name in names:
        df = REGISTRY[name].spark(spark, SF_DIR)
        df.count()
        del df
        gc.collect()
        sc._jvm.System.gc()
        time.sleep(1.5)
        now = persistent(sc)
        new = [t for t in now if t[0] not in baseline]
        if new:
            print(f"{name}: PERSISTENT AFTER GC -> {new}", flush=True)
            baseline |= {t[0] for t in now}
        else:
            print(f"{name}: clean ({len(now)} total)", flush=True)
    print("FINAL:", persistent(sc))


if __name__ == "__main__":
    main()
