"""r15 verdict item 2: vocabulary-axis A/B for the Aho-Corasick
scanner — dict-of-dicts automaton shipped in the UDF closure (the r14
form, reconstructed inline) vs the flat dense-DFA broadcast form
(operators/keywordscan.py r15).

The r14 vocab axis (SCALE.md: 1k 4.14 s / 10k 4.62 s / 100k 12.7 s
over 80k docs) named closure-ship + dict cache pressure as the
100k-term constant. This probe re-measures both forms interleaved
(ABAB, same session, same corpus — the only comparison the ambient
protocol accepts) with cpu-probe anchors.

Corpus: the r13 growth generator at 16x (80k docs — the same corpus
family the r14 axis used). Vocabulary: a deterministic md5-derived
blocklist with a slice of real corpus tokens so matches occur.

Usage: python tools/r15_aho_ab.py            # vocab 1k,10k,100k
       AHO_VOCABS=1000,100000 AHO_REPS=3 python tools/r15_aho_ab.py
Results -> stdout JSON; recorded in SCALE.md.
"""

from __future__ import annotations

import gc
import hashlib
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from electrician_spark.operators import keywordscan as ks  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402
from r13_growth_probe import gen  # noqa: E402

ALNUM = "abcdefghijklmnopqrstuvwxyz0123456789"


def vocab(nv: int) -> list[str]:
    """Deterministic blocklist: ~1% real corpus tokens (so the scan
    produces matches), rest md5-derived strings of length 4-12."""
    real = [f"bp{s}t{j}" for s in range(50) for j in range(12)]
    out = dict.fromkeys(real[: max(10, nv // 100)])
    i = 0
    while len(out) < nv:
        h = hashlib.md5(f"term:{i}".encode()).hexdigest()
        ln = 4 + (int(h[:2], 16) % 9)
        out["".join(ALNUM[int(h[2 + 2 * k : 4 + 2 * k], 16) % 36] for k in range(ln))] = None
        i += 1
    return list(out)


def old_keyword_hits(df, terms):
    """The r14 implementation: dict automaton in the UDF closure."""
    auto = ks.build_automaton(terms)
    tarr = list(terms)

    @F.pandas_udf("array<string>")
    def _scan(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            return sorted({tarr[i] for i in ks.scan_text(t, *auto)})

        return texts.map(one)

    return df.withColumn("keyword_hits", _scan(F.col("text")))


def main() -> None:
    vocabs = tuple(
        int(x) for x in os.environ.get("AHO_VOCABS", "1000,10000,100000").split(",")
    )
    reps = int(os.environ.get("AHO_REPS", "3"))
    spark = get_session("r15-aho-ab", cpus=cpu_budget())

    def _warm(pdf):
        return pdf

    spark.range(64).repartition(32).groupBy("id").applyInPandas(_warm, "id long").count()

    def cpu_probe() -> float:
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            spark.range(1_200_000_000).select(F.max(F.xxhash64("id"))).collect()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 4)

    cpu_probe()
    probe_before = cpu_probe()

    root = os.environ.get("GROWTH_DIR") or tempfile.mkdtemp(prefix="r15aho_")
    d = gen(root, 16)  # 80k docs
    docs = spark.read.parquet(os.path.join(d, "documents.parquet")).select(
        "doc_id", "text"
    )

    def run(df) -> tuple[float, int]:
        gc.collect()
        t0 = time.perf_counter()
        (total,) = df.select(F.sum(F.size("keyword_hits"))).collect()[0]
        return time.perf_counter() - t0, int(total)

    results = {}
    for nv in vocabs:
        terms = vocab(nv)
        t0 = time.perf_counter()
        flat = ks.build_flat_automaton(terms)
        build_flat_sec = time.perf_counter() - t0
        assert flat is not None, "dense budget exceeded — A/B not comparable"
        old_t, new_t = [], []
        old_n = new_n = None
        for _ in range(reps):
            sec, old_n = run(old_keyword_hits(docs, terms))
            old_t.append(sec)
            sec, new_n = run(ks.keyword_hits(docs, terms))
            new_t.append(sec)
        assert old_n == new_n, (nv, old_n, new_n)
        results[str(nv)] = {
            "old_closure_dict_sec": round(statistics.median(old_t), 3),
            "new_flat_broadcast_sec": round(statistics.median(new_t), 3),
            "old_runs": [round(t, 3) for t in old_t],
            "new_runs": [round(t, 3) for t in new_t],
            "speedup": round(statistics.median(old_t) / statistics.median(new_t), 2),
            "hits": old_n,
            "flat_build_sec": round(build_flat_sec, 2),
            "states": int(flat.delta.shape[0]),
            "alphabet": int(len(flat.alphabet)),
            "dense_mb": round(flat.delta.nbytes / 2**20, 1),
        }
        print(json.dumps({nv: results[str(nv)]}), flush=True)

    probe_after = cpu_probe()
    print(
        json.dumps(
            {
                "metric": "aho_vocab_axis_ab",
                "docs": 80_000,
                "results": results,
                "cpu_probe_before_sec": probe_before,
                "cpu_probe_after_sec": probe_after,
                "cpu_probe_nominal_sec": 0.25,
                "host_degraded": max(probe_before, probe_after) >= 0.5,
            }
        )
    )


if __name__ == "__main__":
    main()
