"""r16 verdict item 5: per-query driver-side construction cost, as
JVM (py4j) round-trip counts — deterministic and ambient-free, the r15
continuation session's target metric for plan-construction work.

Counts calls to py4j's GatewayClient.send_command while the registry
function BUILDS its DataFrame (no action), plus wall time of the build.

Usage: python tools/r16_construct_profile.py q_d6_dup_clusters q_id1_incremental_dedup
       python tools/r16_construct_profile.py            # the r15 heads
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT = ["q_id1_incremental_dedup", "q_d6_dup_clusters", "q_ir1_dsir_select"]


def count_round_trips(fn, *args) -> tuple[int, float]:
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    fn(*args)
    pr.disable()
    dt = time.perf_counter() - t0
    st = pstats.Stats(pr)
    n = 0
    for (filename, _lineno, name), (cc, _nc, _tt, _ct, _callers) in st.stats.items():
        if name == "send_command" and "java_gateway" in filename:
            # count the client-level entry (each is one JVM round trip);
            # py4j has send_command on both GatewayClient and
            # GatewayConnection — take the max to count each trip once
            n = max(n, cc)
    return n, dt


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_session("r16-construct", cpus=cpu_budget())
    spark.range(1).count()
    for name in names:
        qd = REGISTRY[name]
        # one unprofiled warm-up so lazy imports/JIT don't inflate run 1
        qd.spark(spark, SF_DIR)
        n, dt = count_round_trips(qd.spark, spark, SF_DIR)
        print(f"{name}: {n} JVM round trips, build wall {dt:.3f}s", flush=True)


if __name__ == "__main__":
    main()
