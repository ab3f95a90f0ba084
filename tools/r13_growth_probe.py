"""r13 verdict item 7: realistic-growth corpus axis for the dedup family.

The r10 replica axis keeps per-shingle document frequency FLAT (each
replica remaps ids bijectively), which is exactly the regime where the
naive DuckDB self-join stays linear and prefix filtering buys nothing —
the r12 judge measured DuckDB ~linear there and rejected the
exponent-crossover defense on that axis. Real corpora don't grow that
way: boilerplate (license headers, navigation chrome, templated
prose) is a FIXED pool shared by a growing number of documents, so hot
shingles' document frequency grows WITH the corpus and the naive
join's candidate set grows ~quadratically (sum over shingles of df²).

This probe generates that regime deterministically (no RNG):
- pool of 50 boilerplate snippets, 12 tokens each; every document
  embeds 2 snippets chosen by md5(doc), so each snippet sits in
  ~N/50 documents — df grows linearly with corpus size;
- ~40 doc-unique content tokens per doc (df=1 shingles — contribute
  zero join pairs);
- 4% of docs form near-duplicate clusters of 4 (base + 3 one-token
  perturbations, J ≈ 0.86) — the true answer, linear in N.

Both engines run the REGISTRY q_d2/q_d3 forms unchanged (engine:
ngram_jaccard_pairs / minhash_lsh_pairs; oracle: the registry SQL) on
the same parquet; outputs are asserted identical at every scale.

Usage: python tools/r13_growth_probe.py          # mults 1,4,16
       GROWTH_MULTS=1,4,16,64 python tools/r13_growth_probe.py
       GROWTH_ENGINES=spark GROWTH_MULTS=64 python tools/r13_growth_probe.py
         # Spark-only point (r14): at 64x (320k docs) the naive DuckDB
         # join is infeasible (~25 min and ~31 GB at 16x already, and
         # the candidate set grows ~quadratically) — so no equality
         # check runs there; outputs were asserted identical at every
         # mult up to 16x, and the 64x point exists to pin the SPARK
         # exponent one step past the crossover.
Results -> stdout; recorded in SCALE.md.
"""

from __future__ import annotations

import hashlib
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

BASE_DOCS = 5_000  # matches sf0.1
POOL = 50
SNIPPETS = [
    " ".join(f"bp{s}t{j}" for j in range(12)) for s in range(POOL)
]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def gen(out_dir: str, mult: int) -> str:
    path = os.path.join(out_dir, f"g{mult}")
    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, "documents.parquet")
    if os.path.exists(f):
        return path
    n = BASE_DOCS * mult
    ids, texts = [], []
    for i in range(n):
        r = i % 100
        base = i - r if r <= 3 else i  # cluster of 4 per 100 docs
        ct = [f"c{base}x{j}" for j in range(40)]
        if r in (1, 2, 3):  # perturb one content token per copy
            ct[10 * r] = f"p{i}"
        s1 = SNIPPETS[_h(f"{base}:s1") % POOL]
        s2 = SNIPPETS[_h(f"{base}:s2") % POOL]
        text = " ".join(ct[:20]) + " " + s1 + " " + " ".join(ct[20:]) + " " + s2
        ids.append(i)
        texts.append(text)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}), f
    )
    return path


def main() -> None:
    mults = tuple(int(x) for x in os.environ.get("GROWTH_MULTS", "1,4,16").split(","))
    reps = int(os.environ.get("GROWTH_REPS", "3"))
    budget = float(os.environ.get("GROWTH_BUDGET_SEC", "120"))  # per engine per point
    engines = [
        e.strip().lower()
        for e in os.environ.get("GROWTH_ENGINES", "spark,duck").split(",")
        if e.strip()
    ]
    unknown = set(engines) - {"spark", "duck"}
    if unknown or "spark" not in engines:
        raise SystemExit(
            f"GROWTH_ENGINES must be a subset of spark,duck including spark "
            f"(got {engines!r}) — a typo here would silently skip the oracle "
            f"equality check"
        )
    with_duck = "duck" in engines

    spark = get_session("r13-growth", cpus=cpu_budget())

    def _warm(pdf):
        return pdf

    spark.range(64).repartition(32).groupBy("id").applyInPandas(_warm, "id long").count()

    root = os.environ.get("GROWTH_DIR") or tempfile.mkdtemp(prefix="r13growth_")
    print(f"corpus root: {root}", flush=True)

    rows = {
        "d2": ("q_d2_ngram_jaccard", REGISTRY["q_d2_ngram_jaccard"]),
        "d3": ("q_d3_minhash_lsh", REGISTRY["q_d3_minhash_lsh"]),
    }

    for mult in mults:
        d = gen(root, mult)
        con = duckdb.connect()
        con.execute(f"SET threads={cpu_budget()}")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{os.path.join(d, 'documents.parquet')}'"
        )
        for key, (name, qd) in rows.items():
            print(f"{mult}x {key}: spark eq-run...", flush=True)
            # equality check once (sorted rows, 6dp)
            srows = [
                (r[0], r[1], round(float(r[2]), 6)) for r in qd.spark(spark, d).collect()
            ]
            if with_duck:
                print(f"{mult}x {key}: duck eq-run...", flush=True)
                orows = [
                    (r[0], r[1], round(float(r[2]), 6))
                    for r in con.execute(qd.oracle).fetchall()
                ]
                match = srows == orows
                print(
                    f"{mult}x {key}: pairs={len(srows)} identical={match}", flush=True
                )
                assert match, (mult, key, len(srows), len(orows), srows[:2], orows[:2])
            else:
                print(
                    f"{mult}x {key}: pairs={len(srows)} (spark-only point — no "
                    f"oracle run at this scale; equality held at every smaller "
                    f"mult)",
                    flush=True,
                )

            def t_spark():
                t0 = time.perf_counter()
                qd.spark(spark, d).collect()
                return time.perf_counter() - t0

            def t_duck():
                t0 = time.perf_counter()
                con.execute(qd.oracle).fetchall()
                return time.perf_counter() - t0

            out = {}
            timed = [("spark", t_spark)] + ([("duck", t_duck)] if with_duck else [])
            for eng, fn in timed:
                warm = fn()
                if warm > budget:
                    out[eng] = [round(warm, 3)]  # too slow to repeat
                    continue
                ts = [fn() for _ in range(reps)]
                out[eng] = [round(x, 3) for x in ts]
            sm = statistics.median(out["spark"])
            if with_duck:
                dm = statistics.median(out["duck"])
                print(
                    f"{mult}x {key}: spark={sm:.3f}s {out['spark']} duck={dm:.3f}s "
                    f"{out['duck']} ratio={sm / dm:.2f}x",
                    flush=True,
                )
            else:
                print(
                    f"{mult}x {key}: spark={sm:.3f}s {out['spark']} (spark-only)",
                    flush=True,
                )
        con.close()


if __name__ == "__main__":
    main()
