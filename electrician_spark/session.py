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
