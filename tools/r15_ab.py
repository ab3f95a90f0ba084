"""r15 optimization-round interleaved A/B: time a registry query with
and without its module-level localCheckpoint materializations (the
no-checkpoint side replicates the pre-optimization plan when the
optimization IS the added checkpoint), or two registry queries against
each other.

Usage:
  python tools/r15_ab.py ck q_ir1_dsir_select      # current vs checkpoint-suppressed
  AB_REPS=5 python tools/r15_ab.py ck q_lm2_bigram_buckets

Protocol (memory/round-protocols): one idle session, interleaved ABAB,
warm-up then median of AB_REPS, collect() as the action, outputs
asserted identical between the two sides every rep.
"""

from __future__ import annotations

import contextlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402

from electrician_spark.benchvariants import resolve_variant  # noqa: E402
from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@contextlib.contextmanager
def no_checkpoint():
    orig = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self
    try:
        yield
    finally:
        DataFrame.localCheckpoint = orig


def canon(rows):
    return sorted(tuple(r) for r in rows)


def main() -> None:
    mode, name = sys.argv[1], sys.argv[2]
    assert mode == "ck", mode
    fn = resolve_variant(name, SF_DIR) or REGISTRY[name].spark
    spark = get_session("r15-ab", cpus=cpu_budget())
    reps = int(os.environ.get("AB_REPS", "5"))

    sides = [("cur", contextlib.nullcontext), ("nock", no_checkpoint)]
    series: dict[str, list[float]] = {s: [] for s, _ in sides}
    ref = None
    for rep in range(reps + 1):  # rep 0 = warm-up, unrecorded
        for label, ctx in sides:
            with ctx():
                spark.sparkContext.setJobDescription(f"r15-ab:{name}:{label}:{rep}")
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                dt = time.perf_counter() - t0
            got = canon(rows)
            if ref is None:
                ref = got
            assert got == ref, f"output drift on {label} rep {rep}"
            if rep:
                series[label].append(dt)
    spark.sparkContext.setJobDescription(None)
    for label, ts in series.items():
        print(
            f"{label}: median={statistics.median(ts):.3f}s min={min(ts):.3f}s "
            f"runs={[round(x, 3) for x in ts]}"
        )


if __name__ == "__main__":
    main()
