"""r16 verdict item 7: a timed surface for the streaming rows.

The 16 streaming paths are optimized-by-proxy (their per-batch plans
are audited batch operators) but have no timed row in the bench, so a
per-batch regression is invisible. This micro-bench times the three
stateful rows the verdict named (q_rs1 resequence, q_rl1 rate-limit,
q_wm1 watermark late-drop) over their fixed 3-batch availableNow
replays and records BOTH:

- wall-clock per run (median of STREAM_REPS after one warm-up), and
- per-batch triggerExecution durations from the StreamingQueryListener
  (the engine's own progress metrics — isolates batch latency from the
  fixture-synthesis/setup cost inside each registry row).

Separate from bench.py by design (the driver's headline/extras series
is contract-frozen); output is one JSON line, committed as
STREAM_BENCH_r16.json for later rounds to diff against.

Usage: python tools/r16_stream_bench.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("STREAM_REPS", "3"))
ROWS = ["q_rs1_resequence_stateful", "q_rl1_rate_limit_stateful", "q_wm1_watermark_late_drop"]


class _BatchTimer(StreamingQueryListener):
    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            {
                "name": p.name,
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "triggerExecution_ms": (p.durationMs or {}).get("triggerExecution"),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def main() -> None:
    spark = get_session("r16-stream-bench", cpus=cpu_budget())

    def _warm(pdf):
        return pdf

    spark.range(64).repartition(32).groupBy("id").applyInPandas(_warm, "id long").count()

    timer = _BatchTimer()
    spark.streams.addListener(timer)

    out: dict[str, dict] = {}
    for name in ROWS:
        qd = REGISTRY[name]
        walls: list[float] = []
        per_batch: list[list] = []
        for rep in range(REPS + 1):  # rep 0 = warm-up
            timer.batches.clear()
            spark.sparkContext.setJobDescription(f"r16-stream:{name}:{rep}")
            t0 = time.perf_counter()
            n_rows = qd.spark(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            # listener events are async; give the last batch a moment
            deadline = time.time() + 5
            while time.time() < deadline and not timer.batches:
                time.sleep(0.1)
            time.sleep(0.3)
            batches = [
                b["triggerExecution_ms"]
                for b in timer.batches
                if b["numInputRows"] or b["triggerExecution_ms"]
            ]
            if rep:
                walls.append(dt)
                per_batch.append(batches)
        out[name] = {
            "wall_median_sec": round(statistics.median(walls), 4),
            "wall_runs_sec": [round(x, 4) for x in walls],
            "result_rows": n_rows,
            "batch_trigger_ms": per_batch,
        }
        print(f"{name}: wall={out[name]['wall_median_sec']}s batches={per_batch[-1]}", flush=True)
    spark.sparkContext.setJobDescription(None)

    line = json.dumps(
        {
            "metric": "stream_batch_latency",
            "unit": "sec",
            "sf_dir": SF_DIR,
            "cpus": cpu_budget(),
            "reps": REPS,
            "rows": out,
        }
    )
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "STREAM_BENCH_r16.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
