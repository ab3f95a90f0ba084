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
    """Unpersist localCheckpoint RDDs that survive explicit GC.

    Long busy py4j sessions can lose detach commands (the JavaObject
    finalizer's `del` message is dropped if it races an active gateway
    command), leaving the JVM gateway map holding a Dataset — and
    through its plan, a checkpointed RDD — forever. Observed r10: a
    full bench series strands 3-13 small RDDs nondeterministically;
    the same queries drain to zero when run in short sessions. The
    stranded blocks are tiny and perf-neutral, but a PERPETUAL driver
    (streaming, notebook) should sweep them: after ``gc_rounds`` of
    driver+JVM GC, anything still registered is unreachable from live
    Python code by construction, so unpersisting it cannot force a
    recompute later. Returns the number of RDDs released. Call ONLY at
    a quiet point (between jobs) — never mid-query, where a plan that
    is still executing may legitimately hold a checkpoint."""
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
