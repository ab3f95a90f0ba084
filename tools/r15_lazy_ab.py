"""Interleaved A/B: default (eager) localCheckpoint sites vs the same
sites forced LAZY (eager=False) — measures what the eager driver
barriers cost a query, without touching the operator code.

Usage: AB_REPS=5 python tools/r15_lazy_ab.py q_d3_minhash_lsh [...]

Protocol (memory/round-protocols): one idle session, interleaved ABAB,
warm-up rep unrecorded, collect() as the action, outputs asserted
identical between the two sides every rep. Sites that pass an explicit
``eager=`` keyword (e.g. suffixarray's documented eager=True) keep it —
only default-eager call sites flip.
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

_ORIG = DataFrame.localCheckpoint
_SENTINEL = object()


@contextlib.contextmanager
def force_lazy_default():
    def patched(self, eager=_SENTINEL):
        if eager is _SENTINEL:  # default-eager call site -> lazy
            return _ORIG(self, eager=False)
        return _ORIG(self, eager=eager)  # explicit keyword: keep it

    DataFrame.localCheckpoint = patched
    try:
        yield
    finally:
        DataFrame.localCheckpoint = _ORIG


def canon(rows):
    return sorted(tuple(r) for r in rows)


def main() -> None:
    names = sys.argv[1:]
    spark = get_session("r15-lazy-ab", cpus=cpu_budget())
    reps = int(os.environ.get("AB_REPS", "5"))

    for name in names:
        fn = resolve_variant(name, SF_DIR) or REGISTRY[name].spark
        sides = [("eager", contextlib.nullcontext), ("lazy", force_lazy_default)]
        series: dict[str, list[float]] = {s: [] for s, _ in sides}
        ref = None
        for rep in range(reps + 1):  # rep 0 = warm-up, unrecorded
            for label, ctx in sides:
                with ctx():
                    spark.sparkContext.setJobDescription(f"r15-lazy-ab:{name}:{label}:{rep}")
                    t0 = time.perf_counter()
                    rows = fn(spark, SF_DIR).collect()
                    dt = time.perf_counter() - t0
                got = canon(rows)
                if ref is None:
                    ref = got
                assert got == ref, f"output drift on {name} {label} rep {rep}"
                if rep:
                    series[label].append(dt)
        ref = None
        spark.sparkContext.setJobDescription(None)
        for label, ts in series.items():
            print(
                f"{name} {label}: median={statistics.median(ts):.3f}s "
                f"min={min(ts):.3f}s runs={[round(x, 3) for x in ts]}"
            )


if __name__ == "__main__":
    main()
