"""One-off PageRank scaling probe — the SCALE.md §Link-graph artifact.

Builds synthetic preferential-attachment-ish host graphs (each node i
links to md5-derived targets biased toward low ids — the hub-skew
shape of real web graphs) at 1x / 4x / 16x node counts, runs a fixed
5-iteration PageRank, and reports the fitted wall-time exponent
log(t16/t1)/log(16). Constant iteration count isolates the per-round
cost, which is the scaling claim (linear in |E| per round).

Usage: python tools/pagerank_probe.py [--base 20000] [--mults 1,4,16]
Prints one JSON line; paste the table into SCALE.md §Link-graph.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from electrician_spark.operators.linkgraph import pagerank  # noqa: E402
from electrician_spark.session import get_session  # noqa: E402

OUT_DEG = 8


def synth_edges(spark, n_nodes: int):
    """~OUT_DEG md5-derived edges per node, targets biased toward low
    ids (t = h² scaled — quadratic bias creates the hub skew); self
    loops dropped, so |E| ≈ n · OUT_DEG."""
    base = spark.range(n_nodes).select(F.col("id").alias("src"))
    fan = base.select(
        "src", F.explode(F.sequence(F.lit(0), F.lit(OUT_DEG - 1))).alias("j")
    )
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", "src", "j")), 1, 8), 16, 10
    ).cast("double") / F.lit(float(1 << 32))
    dst = F.floor(h * h * n_nodes).cast("long")
    return (
        fan.select("src", dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=20000)
    ap.add_argument("--mults", default="1,4,16")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--iterations", type=int, default=5)
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for m in mults:
        n = args.base * m
        edges = synth_edges(spark, n).localCheckpoint()  # exclude synth cost
        n_edges = edges.count()
        timings = []
        for i in range(args.runs + 1):  # first run warms codegen
            t0 = time.time()
            out = pagerank(edges, iterations=args.iterations)
            total = out.agg(F.sum("rank")).first()[0]
            timings.append(time.time() - t0)
        assert abs(total - 1.0) < 1e-3, total
        results[m] = {
            "nodes": n,
            "edges": n_edges,
            "sec": round(statistics.median(timings[1:]), 2),
        }
    lo, hi = mults[0], mults[-1]
    exponent = math.log(results[hi]["sec"] / results[lo]["sec"]) / math.log(hi / lo)
    print(
        json.dumps(
            {
                "probe": "pagerank",
                "iterations": args.iterations,
                "results": results,
                "fitted_exponent": round(exponent, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
