"""r16 verdict item 4: refresh the suffix-array compact-vs-distributed
regime bound on post-r15 code (the level-0 vocab-rank change shifted
the compact side's cost profile, so the r12 crossover may have moved).

Interleaved A/B of suffix_array() with the regime forced each way:
- compact: compact_rank_max_rows high enough to engage everywhere
- distributed: compact_rank_max_rows=0

Points: sf0.1 documents (~270k positions) and the 4x growth corpus
(~1.07M positions — just past the 1M gate). Outputs asserted identical
every rep (collect of the full (id, pos, rank) table).

Usage: python tools/r16_sx_regime_ab.py /root/testdata/sf0.1 /tmp/r16growth/g4
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from electrician_spark.operators import suffixarray as sa  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    reps = int(os.environ.get("AB_REPS", "3"))
    spark = get_session("r16-sx-regime", cpus=cpu_budget())

    def _warm(pdf):
        return pdf

    spark.range(64).repartition(32).groupBy("id").applyInPandas(_warm, "id long").count()

    for d in dirs:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet")).select(
            "doc_id", "text"
        )
        n_pos = docs.select(
            F.sum(F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda x: F.length(x) > 0)))
        ).first()[0]
        sides = [
            ("compact", lambda: sa.suffix_array(docs, compact_rank_max_rows=1 << 40)),
            ("distrib", lambda: sa.suffix_array(docs, compact_rank_max_rows=0)),
        ]
        series: dict[str, list[float]] = {s: [] for s, _ in sides}
        ref = None
        for rep in range(reps + 1):
            for label, build in sides:
                spark.sparkContext.setJobDescription(f"r16-sx:{d}:{label}:{rep}")
                t0 = time.perf_counter()
                rows = build().collect()
                dt = time.perf_counter() - t0
                got = sorted((r[0], r[1], r[2]) for r in rows)
                if ref is None:
                    ref = got
                assert got == ref, (d, label, rep)
                if rep:
                    series[label].append(dt)
        ref = None
        msg = " ".join(
            f"{s}={statistics.median(ts):.3f}s {[round(x, 3) for x in ts]}"
            for s, ts in series.items()
        )
        print(f"{d} positions={n_pos}: {msg}", flush=True)


if __name__ == "__main__":
    main()
