"""r13 verdict items 1-2: same-session interleaved A/B of q_d2/q_d3
variants vs their DuckDB oracles at sf0.1.

Variants (all oracle-identical output — asserted once per variant):
- d2/df      : current registry form (prefix_order="df" + lazy localCheckpoint)
- d2/df-nock : df order, checkpoint suppressed
- d2/lex     : prefix_order="lex" (single shingle consumer, no checkpoint)
- d3/cur     : current registry form (two eager localCheckpoints)
- d3/nock    : checkpoints suppressed

Protocol (memory/round-protocols): one idle session, interleaved ABAB,
warm-up then median of 3, collect() as the action (matches bench.py's
timed action; NEVER count() — sorts/windows prune), DuckDB min-of-3 warm
with threads=32 in the same process, interleaved with the Spark reads.
"""

from __future__ import annotations

import contextlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402

from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@contextlib.contextmanager
def no_checkpoint():
    orig = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self
    try:
        yield
    finally:
        DataFrame.localCheckpoint = orig


def spark_thunk(name, **kwargs):
    from electrician_spark.operators import dedup

    def run(spark):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        if name == "d2":
            return dedup.ngram_jaccard_pairs(docs, threshold=0.8, **kwargs).orderBy(
                "id_a", "id_b"
            )
        return dedup.minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, threshold=0.8
        ).orderBy("id_a", "id_b")

    return run


def main() -> None:
    spark = get_session("r13-dedup-ab", cpus=cpu_budget())

    con = duckdb.connect()
    con.execute(f"SET threads={cpu_budget()}")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracles = {
        "d2": REGISTRY["q_d2_ngram_jaccard"].oracle,
        "d3": REGISTRY["q_d3_minhash_lsh"].oracle,
    }

    variants = [
        ("d2/df", spark_thunk("d2", prefix_order="df"), None),
        ("d2/df-nock", spark_thunk("d2", prefix_order="df"), no_checkpoint),
        ("d2/lex", spark_thunk("d2", prefix_order="lex"), None),
        ("d3/cur", spark_thunk("d3"), None),
        ("d3/nock", spark_thunk("d3"), no_checkpoint),
    ]

    # correctness pin once per variant (row counts vs oracle)
    for label, fn, ctx in variants:
        cm = ctx() if ctx else contextlib.nullcontext()
        with cm:
            rows = fn(spark).collect()
        key = label.split("/")[0]
        orows = con.execute(oracles[key]).fetchall()
        assert len(rows) == len(orows), (label, len(rows), len(orows))
        svals = [(r[0], r[1], round(float(r[2]), 6)) for r in rows]
        ovals = [(r[0], r[1], round(float(r[2]), 6)) for r in orows]
        assert svals == ovals, (label, svals[:3], ovals[:3])
        print(f"{label}: oracle-identical ({len(rows)} pairs)", flush=True)

    reps = int(os.environ.get("AB_REPS", "3"))
    series: dict[str, list[float]] = {}

    def rec(k, dt):
        series.setdefault(k, []).append(dt)

    # interleave: each rep runs every variant + both oracles
    for rep in range(reps + 1):  # rep 0 = warm-up, not recorded
        for label, fn, ctx in variants:
            cm = ctx() if ctx else contextlib.nullcontext()
            with cm:
                t0 = time.perf_counter()
                fn(spark).collect()
                dt = time.perf_counter() - t0
            if rep:
                rec(label, dt)
        for key, sql in oracles.items():
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            if rep:
                rec(f"oracle/{key}", dt)

    for k, v in series.items():
        print(
            f"{k}: median={statistics.median(v):.3f}s runs={[round(x, 3) for x in v]}",
            flush=True,
        )
    for key in ("d2", "d3"):
        om = statistics.median(series[f"oracle/{key}"])
        for k in series:
            if k.startswith(key + "/"):
                print(f"ratio {k} vs oracle: {statistics.median(series[k]) / om:.2f}x")


if __name__ == "__main__":
    main()
