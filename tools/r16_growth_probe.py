"""r16 verdict item 1: growth-probe the five sf0.1-neutral structural
wins from r15, each against its one-line revert, so "kept on structural
argument" becomes measured evidence (or a revert).

Paths and the revert mechanism (each r15 change is a localCheckpoint
posture, so the revert is a surgical monkeypatch — the code under test
is the committed operator, never a fork):

- q_bl1  bloom word-table materialization (bloom.py:104, eager=False)
           revert = suppress lazy checkpoints -> the k=4 probe joins
           re-execute the full build subtree once per hash function.
- q_cm1  count-min sketch materialization (sketch.py:240, eager=False)
           revert = suppress lazy -> geometry first() + d broadcast
           builds re-run the corpus build chain 1+d times.
- q_ph1  decode-once signature table (queries.py:634, eager=False)
- q_af1  decode-once fingerprint table (queries.py:4655, eager=False)
           revert = suppress lazy -> every plan branch re-runs the
           synth + decode + DCT/rFFT MapInPandas chain.
           (Probe-local chain: the registry rows pin doc_id 1..36, so
           the probe scales the media row count and bounds the pair
           join to the first 36 ids — filters cannot push below
           MapInPandas, so the unmaterialized branches still re-decode
           the ENTIRE scaled corpus, which is exactly the claim.)
- q_d6   lazy per-round CC checkpoints (dedup.py:762/789, eager=False)
           revert = force eager -> one extra driver barrier per round.
- q_ir1 / q_pg1: no revert (the r15 zero-collect changes are code, not
           checkpoints) — growth exponents on current code only, to
           confirm the collect cuts compound instead of eroding.

Corpus: the r13 realistic-growth regime (fixed boilerplate pool ->
per-shingle df grows with the corpus; near-dup clusters of 4 -> true
answer linear), extended with a deterministic lang column (q_ir1) and
a scaled orders table (q_cm1 keyed stream, q_pg1 edges).

Protocol: per mult, interleaved A/B (warm-up pair, then REPS pairs),
collect() as the action, outputs asserted identical between variants
every rep. Exponent = log(t_hi/t_1)/log(hi).

Usage: python tools/r16_growth_probe.py                 # mults 1,4,16
       GROWTH_MULTS=1,4,16,64 GROWTH_PATHS=bl1,cm1 python tools/r16_growth_probe.py
Results -> stdout; recorded in SCALE.md.
"""

from __future__ import annotations

import contextlib
import hashlib
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

BASE_DOCS = 5_000  # matches sf0.1
BASE_ORDERS = 150_000  # matches sf0.1
POOL = 50
SNIPPETS = [" ".join(f"bp{s}t{j}" for j in range(12)) for s in range(POOL)]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def gen(out_dir: str, mult: int, tables: tuple = ("documents", "orders")) -> str:
    """documents (r13 regime + lang) and orders (scaled key stream).
    ``tables`` bounds what gets written (bench.py's core-scaling
    attestation needs only documents — the orders loop is the slow
    part at 64x)."""
    path = os.path.join(out_dir, f"g{mult}")
    os.makedirs(path, exist_ok=True)
    fd = os.path.join(path, "documents.parquet")
    if "documents" in tables and not os.path.exists(fd):
        n = BASE_DOCS * mult
        ids, texts, langs = [], [], []
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
            langs.append("en" if _h(f"{i}:l") % 3 == 0 else "xx")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": texts,
                    "lang": langs,
                }
            ),
            fd,
        )
    fo = os.path.join(path, "orders.parquet")
    if "orders" in tables and not os.path.exists(fo):
        n = BASE_ORDERS * mult
        okeys = list(range(1, n + 1))
        ckeys = [_h(f"{i}:c") % 100_000 for i in range(n)]
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(okeys, pa.int64()),
                    "o_custkey": pa.array(ckeys, pa.int64()),
                }
            ),
            fo,
        )
    return path


# --- variant contexts ------------------------------------------------------

_ORIG_CKPT = DataFrame.localCheckpoint


@contextlib.contextmanager
def suppress_lazy():
    """Revert the r15 'materialize the bounded shared table' changes:
    eager=False checkpoints become no-ops; eager ones (which predate
    r15 on every probed path) stay."""

    def patched(self, eager=True):
        return self if eager is False else _ORIG_CKPT(self, eager=eager)

    DataFrame.localCheckpoint = patched
    try:
        yield
    finally:
        DataFrame.localCheckpoint = _ORIG_CKPT


@contextlib.contextmanager
def force_eager():
    """Revert the r15 lazy-round-checkpoint change (q_d6): every lazy
    checkpoint becomes the old eager per-round driver barrier."""

    def patched(self, eager=True):
        return _ORIG_CKPT(self, eager=True)

    DataFrame.localCheckpoint = patched
    try:
        yield
    finally:
        DataFrame.localCheckpoint = _ORIG_CKPT


# --- probe-local media chains (registry rows pin doc_id 1..36) -------------


def media_chain_ph1(spark, n_media: int):
    """q_ph1's exact chain with the id slice widened to n_media and the
    pair join bounded to the first 36 ids (constant pair volume; the
    scaled axis is the per-row synth+decode+DCT cost, which is the
    claim under test)."""
    from electrician_spark import multimodal as mm
    from electrician_spark.operators import dedup

    ids = spark.range(1, n_media + 1).select(F.col("id").alias("doc_id"))

    def synth(batches):
        import pandas as pd

        from electrician_spark import multimodal as m

        for batch in batches:
            mids, payloads = [], []
            for did in batch["doc_id"]:
                did = int(did)
                fam = did % 4
                w, h = 32 * (1 + did % 3), 32 * (1 + did % 2)
                if fam == 0:
                    v = 30 + (did * 37) % 200
                    c = did % 3
                    if c == 0:
                        payloads.append(m.synth_png_gray(w, h, v))
                    elif c == 1:
                        payloads.append(m.synth_gif_solid(w, h, (v, v, v)))
                    else:
                        payloads.append(m.synth_jpeg_gray_solid(w, h, v))
                else:
                    a = 160 + (did * 7) % 64
                    b = a - 100
                    if fam == 1:
                        payloads.append(m.synth_png_gray_split(w, h, a, b, True))
                    elif fam == 2:
                        payloads.append(m.synth_png_gray_split(w, h, a, b, False))
                    else:
                        payloads.append(m.synth_png_gray_split(w, h, b, a, True))
                mids.append(did)
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    media = ids.mapInPandas(synth, "media_id long, payload binary")
    sig = mm.image_phash(media).select("media_id", "phash")
    sig = sig.localCheckpoint(eager=False)  # the r15 change under test
    small = sig.filter(F.col("media_id") <= 36)
    pairs = dedup.hamming_pairs(small, "media_id", "phash", max_hamming=3)
    near = (
        pairs.select(F.col("id_a").alias("media_id"))
        .unionByName(pairs.select(F.col("id_b").alias("media_id")))
        .groupBy("media_id")
        .agg(F.count("*").alias("n_near"))
    )
    return (
        sig.join(near, "media_id", "left")
        .select(
            "media_id",
            "phash",
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
        )
        .orderBy("media_id")
    )


def media_chain_af1(spark, n_media: int):
    """q_af1's exact chain, widened like media_chain_ph1."""
    import math as _math

    from electrician_spark import multimodal as mm
    from electrician_spark.operators import dedup

    ids = spark.range(1, n_media + 1).select(F.col("id").alias("doc_id"))

    def synth(batches):
        import io
        import struct
        import wave

        import pandas as pd

        RATE, N = 8000, 4096

        def tone(bins, amp, phase, offset):
            out = [0.0] * N
            for b in bins:
                f = b * RATE / N
                for k in range(N):
                    out[k] += amp * _math.sin(2 * _math.pi * f * k / RATE + phase)
            return [int(round(x)) + offset for x in out]

        def wav(samples):
            buf = io.BytesIO()
            w = wave.open(buf, "wb")
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(RATE)
            w.writeframes(struct.pack("<%dh" % len(samples), *samples))
            w.close()
            return buf.getvalue()

        for batch in batches:
            mids, payloads = [], []
            for did in batch["doc_id"]:
                did = int(did)
                fam = did % 4
                amp = 2000 + (did * 37) % 8000
                phase = (did % 3) * _math.pi / 4
                offset = (did % 5) * 100
                if fam == 0:
                    s = [offset] * N
                elif fam == 1:
                    s = tone([512], amp, phase, offset)
                elif fam == 2:
                    s = tone([512, 1536], amp / 2, phase, offset)
                else:
                    s = tone([2017], amp, phase, offset)
                payloads.append(wav(s))
                mids.append(did)
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    media = ids.mapInPandas(synth, "media_id long, payload binary")
    sig = mm.audio_fingerprint(media).select("media_id", "afp")
    sig = sig.localCheckpoint(eager=False)  # the r15 change under test
    small = sig.filter(F.col("media_id") <= 36)
    pairs = dedup.hamming_pairs(small, "media_id", "afp", max_hamming=1)
    near = (
        pairs.select(F.col("id_a").alias("media_id"))
        .unionAll(pairs.select(F.col("id_b").alias("media_id")))
        .groupBy("media_id")
        .agg(F.count("*").alias("n_near"))
    )
    return (
        sig.join(near, "media_id", "left")
        .select(
            "media_id",
            "afp",
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
        )
        .orderBy("media_id")
    )


def pagerank_chain(spark, mult: int):
    """q_pg1's operator on a graph whose node AND edge count scale with
    mult (the registry row pins o_orderkey <= 3000)."""
    from electrician_spark.operators import linkgraph as lg

    n_edges = 3_000 * mult
    edges = spark.range(n_edges).select(
        (F.xxhash64(F.col("id"), F.lit(1)) % (61 * mult)).alias("src"),
        (F.xxhash64(F.col("id"), F.lit(2)) % (67 * mult)).alias("dst"),
    )
    return lg.pagerank(edges, iterations=3).orderBy("node")


# --- harness ----------------------------------------------------------------


def proc_tree_cpu() -> float:
    """Total CPU seconds (utime+stime) of this process and every live
    descendant (the JVM + Python workers), plus reaped-child CPU folded
    into parents (cutime/cstime). Deltas of this across a run measure
    the COMPUTE a variant burned even when concurrent scheduling hides
    it from wall-clock — the metric that exposes k-fold subtree
    re-execution on an idle local[32] (guide §1.1: decide whether the
    time goes to compute, not just where the wall went)."""
    import glob

    hz = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    stats = {}
    for f in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(f).read().rsplit(") ", 1)
            pid = int(parts[0].split(" ", 1)[0])
            rest = parts[1].split()
            ppid = int(rest[1])
            # utime, stime, cutime, cstime at fields 14-17 (1-based)
            u, s_, cu, cs = (int(rest[i]) for i in (11, 12, 13, 14))
            stats[pid] = (ppid, u + s_ + cu + cs)
        except (OSError, ValueError, IndexError):
            continue
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in stats.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack = 0, [me]
    while stack:
        p = stack.pop()
        if p in stats:
            total += stats[p][1]
            stack.extend(kids.get(p, []))
    return total / hz


def canon(rows):
    out = []
    for r in rows:
        out.append(
            tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        )
    return sorted(out)


def main() -> None:
    mults = tuple(int(x) for x in os.environ.get("GROWTH_MULTS", "1,4,16").split(","))
    reps = int(os.environ.get("GROWTH_REPS", "2"))
    budget = float(os.environ.get("GROWTH_BUDGET_SEC", "180"))
    want = {
        p.strip()
        for p in os.environ.get(
            "GROWTH_PATHS", "bl1,cm1,ph1,af1,d6,ir1,pg1"
        ).split(",")
        if p.strip()
    }

    spark = get_session("r16-growth", cpus=cpu_budget())

    def _warm(pdf):
        return pdf

    spark.range(64).repartition(32).groupBy("id").applyInPandas(_warm, "id long").count()

    root = os.environ.get("GROWTH_DIR") or tempfile.mkdtemp(prefix="r16growth_")
    print(f"corpus root: {root}", flush=True)

    # (key, build_df(spark, dir, mult), revert_ctx or None)
    paths = {
        "bl1": (
            lambda s, d, m: REGISTRY["q_bl1_bloom_decontaminate"].spark(s, d),
            suppress_lazy,
        ),
        "cm1": (
            lambda s, d, m: REGISTRY["q_cm1_count_min"].spark(s, d),
            suppress_lazy,
        ),
        "ph1": (lambda s, d, m: media_chain_ph1(s, 36 * m), suppress_lazy),
        "af1": (lambda s, d, m: media_chain_af1(s, 36 * m), suppress_lazy),
        "d6": (
            lambda s, d, m: REGISTRY["q_d6_dup_clusters"].spark(s, d),
            force_eager,
        ),
        "ir1": (lambda s, d, m: REGISTRY["q_ir1_dsir_select"].spark(s, d), None),
        "pg1": (lambda s, d, m: pagerank_chain(s, m), None),
    }

    results: dict[str, dict[int, dict[str, float]]] = {}
    for key, (build, revert_ctx) in paths.items():
        if key not in want:
            continue
        results[key] = {}
        over_budget = False
        for mult in mults:
            if over_budget:
                break
            d = gen(root, mult)
            sides = [("cur", contextlib.nullcontext)]
            if revert_ctx is not None:
                sides.append(("rev", revert_ctx))
            series: dict[str, list[float]] = {s: [] for s, _ in sides}
            cpu: dict[str, list[float]] = {s: [] for s, _ in sides}
            warm: dict[str, float] = {}
            ref = None
            for rep in range(reps + 1):  # rep 0 = warm-up pair
                for label, ctx in sides:
                    with ctx():
                        spark.sparkContext.setJobDescription(
                            f"r16-growth:{key}:{mult}x:{label}:{rep}"
                        )
                        c0 = proc_tree_cpu()
                        t0 = time.perf_counter()
                        rows = build(spark, d, mult).collect()
                        dt = time.perf_counter() - t0
                        dc = proc_tree_cpu() - c0
                    got = canon(rows)
                    if ref is None:
                        ref = got
                    assert got == ref, f"output drift {key} {mult}x {label} rep {rep}"
                    if rep:
                        series[label].append(dt)
                        cpu[label].append(dc)
                    else:
                        warm[label] = dt
                if rep == 0 and max(warm.values()) > budget:
                    # warm-up blew the budget: record it, skip reps+larger
                    series = {s: [warm[s]] for s, _ in sides}
                    over_budget = True
                    break
            spark.sparkContext.setJobDescription(None)
            meds = {s: statistics.median(ts) for s, ts in series.items() if ts}
            results[key][mult] = meds
            msg = " ".join(
                f"{s}={meds[s]:.3f}s {[round(x, 3) for x in series[s]]}"
                for s in meds
            )
            cmsg = " ".join(
                f"{s}={statistics.median(ts):.1f}s" for s, ts in cpu.items() if ts
            )
            print(f"{key} {mult}x rows={len(ref)}: {msg} | cpu: {cmsg}", flush=True)
            # Between measurement points, OUTSIDE all timed regions:
            # drop abandoned plan refs so the ContextCleaner frees
            # checkpoint blocks (bench.py hygiene) — without this, a
            # path running LAST in the session measured 3x its isolated
            # wall (d6 16x: 16.1 s after the bl1/cm1/ph1/af1 series vs
            # 5.8 s isolated, same code same corpus).
            import gc

            gc.collect()
        pts = results[key]
        if len(pts) >= 2:
            lo, hi = min(pts), max(pts)
            expo = math.log(pts[hi]["cur"] / pts[lo]["cur"]) / math.log(hi / lo)
            print(f"{key}: exponent({lo}x->{hi}x) = {expo:.2f}", flush=True)


if __name__ == "__main__":
    main()
