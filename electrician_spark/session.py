"""SparkSession factory.

Deterministic, scale-aware defaults:

- Arrow on (vectorized pandas-UDF path; reference parity: allocation-free
  hot path, /root/reference/pkg/internal/wire/options.go:134).
- AQE on with coalescing + skew-join handling: at 100 TB the static
  shuffle-partition count is always wrong somewhere; AQE re-plans from
  runtime statistics.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- ``spark.sql.shuffle.partitions`` sized from the core budget, not the
  200 default (local runs) — on a real cluster this is overridden by AQE
  anyway because ``adaptive.coalescePartitions`` computes the right number
  from shuffle bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_budget() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "electrician-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    If a session already exists (e.g. the driver passed one in), its
    config wins — Spark ignores builder conf on ``getOrCreate`` of a
    live session, which is the behavior we want.
    """
    n = cpus or cpu_budget()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_stranded_checkpoints(spark: SparkSession, gc_rounds: int = 2) -> int:
    """END-OF-SESSION cleanup: unpersist every RDD still registered
    after explicit GC, for use ONLY when no plan in this session will
    ever be re-executed (bench.py calls it after its final series,
    before results are read out and the process exits).

    Why it exists: long busy py4j sessions can lose detach commands
    (the JavaObject finalizer's `del` message is dropped if it races
    an active gateway command), leaving the JVM gateway map holding a
    Dataset — and through its plan, a checkpointed RDD — forever.
    Observed r10: a full bench series strands 3-13 small RDDs
    nondeterministically; the same queries drain to zero in short
    sessions.

    Why it is NOT a perpetual-driver (notebook / streaming) sweep:
    ``persistentRdds`` is weak-valued, so anything still registered
    after GC is STRONGLY reachable somewhere — possibly a DataFrame a
    live notebook cell or streaming query still holds (py4j gateway
    refs and CacheManager entries survive GC). localCheckpoint
    TRUNCATES lineage, so sweeping a still-referenced checkpoint makes
    the next action on that DataFrame fail with a missing-block error
    instead of recomputing. A long-lived driver that needs cleanup
    should unpersist the specific DataFrames it owns (or use precise
    by-id release, as operators/suffixarray.py does for its
    intermediate rounds) — never this registry-wide sweep. Returns
    the number of RDDs released."""
    import gc as _gc
    import time as _time

    sc = spark.sparkContext
    for _ in range(gc_rounds):
        _gc.collect()
        sc._jvm.System.gc()
        _time.sleep(1.5)
        if sc._jsc.sc().getPersistentRDDs().size() == 0:
            return 0
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    ids = []
    while it.hasNext():
        ids.append(it.next()._1())
    for rid in ids:
        sc._jsc.sc().unpersistRDD(int(rid), False)
    return len(ids)
