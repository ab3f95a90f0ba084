"""Suffix-array-family substring analysis (Lee et al. 2022 §4).

The reference-side capability is exact substring dedup at corpus scale
("Deduplicating Training Data Makes Language Models Better": build a
suffix array over the tokenized corpus, read duplicated runs off
adjacent-suffix LCPs). A literal suffix array is the single-machine
idiom; the Spark-first re-expression splits the capability into the
two things it is actually used for:

- **Equality of fixed-length windows** (the dedup workhorse): prefix
  DOUBLING over per-document windows — level-k fingerprint identifies
  the 2^k-token window at each position, built as
  ``md5(fp_k[p] || fp_k[p+2^k])``. Any window length L then costs
  O(1) per site from two stored levels (``2^k <= L < 2^(k+1)``:
  the L-window equals the pair (fp_k[p], fp_k[p+L-2^k]) — the classic
  sparse-table/doubling LCP identity). Total cost O(N log L) hash ops
  and ONE exchange (every level is a ``lead`` over the same
  partitionBy(doc).orderBy(pos) window, so Spark sorts once and
  stacks the window operators), versus O(N·L) token hashing for the
  naive fixed-window fingerprint at large L. Equality is by 128-bit
  md5 — collision odds ~2^-64 at billions of windows, the same
  contract every fingerprint in this package rides on.

- **Suffix ORDER** (rank/lexicographic applications): true prefix
  doubling (Manber-Myers / Flick & Aluru's distributed form) with
  order-preserving dense ranks per level. The global dense rank is
  range-partition + per-partition rank + bounded per-partition offset
  collect (one row per partition) — never a single-reducer window.

Reference parity: the fixed-window detector `repeated_ngram_spans`
(dedup.py) and `sa_duplicated_spans` here are pinned EQUAL in tests;
this module is the scale path for large ``min_len`` and adds the
order-based operators (suffix_array, longest_repeated_run).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from electrician_spark.operators.dedup import _tokens_table

_SEP = "\x1f"


def _doc_window(id_col: str = "_id", pos_col: str = "_pos"):
    return Window.partitionBy(id_col).orderBy(pos_col)


def _positions(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, _pos, _len, _fp0) positional token table; _fp0 = md5 of
    the single token (fixed-width level-0 fingerprint, so later-level
    concat fingerprints never ambiguity-collide on token boundaries)."""
    tk = _tokens_table(docs, id_col, text_col)
    return tk.select(
        "_id",
        F.size("_tk").alias("_len"),
        F.posexplode("_tk").alias("_pos", "_tok"),
    ).select("_id", "_pos", "_len", F.md5("_tok").alias("_fp0"))


def _with_doubling_fps(pos: DataFrame, max_level: int) -> DataFrame:
    """Append _fp1.._fp{max_level}: _fp{k}[p] identifies tokens
    [p, p+2^k) exactly (NULL when the window overruns the document).
    Every level is one ``lead`` over the same per-document window, so
    the whole ladder costs ONE exchange + one sort."""
    w = _doc_window()
    out = pos
    for k in range(max_level):
        half = 1 << k
        nxt = F.lead(f"_fp{k}", half).over(w)
        out = out.withColumn(
            f"_fp{k + 1}",
            F.when(
                nxt.isNotNull(),
                F.md5(F.concat_ws(_SEP, F.col(f"_fp{k}"), nxt)),
            ),
        )
    return out


def window_fingerprints(
    docs: DataFrame,
    window_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, fp): md5-equality fingerprint of the ``window_len``-
    token window at each position where it fits. O(1) per site from
    the doubling ladder: fp = md5(fp_k[p] || fp_k[p + L - 2^k]) with
    2^k <= L — the two half-windows cover [p, p+L) exactly, so fp
    equality <=> window equality (mod md5)."""
    if window_len < 1:
        raise ValueError(f"window_len must be >= 1, got {window_len}")
    k = int(math.floor(math.log2(window_len)))
    pos = _with_doubling_fps(_positions(docs, id_col, text_col), k)
    shift = window_len - (1 << k)
    fpk = F.col(f"_fp{k}")
    other = F.lead(f"_fp{k}", shift).over(_doc_window()) if shift else fpk
    fp = fpk if shift == 0 else F.md5(F.concat_ws(_SEP, fpk, other))
    return (
        pos.withColumn("_wfp", fp)
        .filter(F.col("_pos") + window_len <= F.col("_len"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_pos").alias("pos"),
            F.col("_wfp").alias("fp"),
        )
    )


def sa_duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 8,
    keep: str | None = None,
) -> DataFrame:
    """Maximal duplicated token spans (id, start_tok, end_tok,
    n_tokens) — the suffix-doubling form of
    :func:`dedup.repeated_ngram_spans`, pinned output-EQUAL to it in
    tests. Detection: flag every position whose min_len-token window
    occurs >= 2 times corpus-wide (``keep='first'`` exempts the
    lexicographically-first (id, pos) site of each window so one copy
    survives a downstream strip); merge flagged starts into maximal
    [start, end) intervals per document. A duplicated run of exact
    length R >= min_len flags starts p0..p0+R-min_len, so the merged
    span is exactly [p0, p0+R) — maximality without ever computing an
    LCP. Scale shape: the O(N log min_len) ladder above plus the same
    one-groupBy/one-join-back flagging as the fixed-window path, but
    with O(1) per-site hashing — the honest win at large min_len
    (Lee 2022 uses 50-token runs)."""
    if keep not in ("first", None):
        raise ValueError(f"keep must be 'first' or None, got {keep!r}")
    sites = window_fingerprints(docs, min_len, id_col, text_col).select(
        F.col(id_col).alias("_id"), F.col("pos").alias("_p"), F.col("fp").alias("_fp")
    )
    try:
        sites = sites.localCheckpoint(eager=False)
    except Exception:  # noqa: BLE001 — e.g. Spark Connect; recompute
        pass
    grouped = sites.groupBy("_fp").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct(F.col("_id").alias("i"), F.col("_p").alias("p"))).alias(
            "_first"
        ),
    )
    flagged = sites.join(grouped.filter(F.col("_cnt") >= 2), "_fp")
    if keep == "first":
        flagged = flagged.filter(
            (F.col("_id") != F.col("_first.i")) | (F.col("_p") != F.col("_first.p"))
        )
    spans = flagged.select(
        "_id", F.col("_p").alias("_s"), (F.col("_p") + min_len).alias("_e")
    )
    w = Window.partitionBy("_id").orderBy("_s")
    prev_end = F.max("_e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grp = F.sum(
        F.when(prev_end.isNull() | (F.col("_s") > prev_end), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        spans.withColumn("_g", grp)
        .groupBy("_id", "_g")
        .agg(F.min("_s").alias("start_tok"), F.max("_e").alias("end_tok"))
        .select(
            F.col("_id").alias(id_col),
            "start_tok",
            "end_tok",
            (F.col("end_tok") - F.col("start_tok")).alias("n_tokens"),
        )
    )


def longest_repeated_run(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
) -> int:
    """Length of the longest token run occurring >= 2 times corpus-wide
    (0 if none of length >= min_len): binary search on the run length,
    each probe one window-fingerprint duplicate-existence check — the
    suffix-array "max adjacent LCP" read, re-expressed as O(log maxlen)
    bounded aggregates instead of a corpus-wide LCP array. The doubling
    ladder is built ONCE at the max level the search can touch and
    materialized (lazy localCheckpoint); every probe then derives its
    window fingerprint from two stored levels — without the shared
    ladder each probe would rebuild (and re-scan) the whole corpus."""
    pos0 = _positions(docs, id_col, text_col)
    hi = int(pos0.agg(F.max("_len").alias("m")).first()["m"] or 0)
    lo = min_len
    if hi < lo:
        return 0
    max_level = int(math.floor(math.log2(hi))) if hi > 1 else 0
    pos = _with_doubling_fps(pos0, max_level)
    try:
        pos = pos.localCheckpoint(eager=False)
    except Exception:  # noqa: BLE001 — e.g. Spark Connect; recompute
        pass
    w = _doc_window()

    def has_dup(length: int) -> bool:
        k = int(math.floor(math.log2(length)))
        shift = length - (1 << k)
        fpk = F.col(f"_fp{k}")
        fp = fpk if shift == 0 else F.md5(
            F.concat_ws(_SEP, fpk, F.lead(f"_fp{k}", shift).over(w))
        )
        fps = (
            pos.withColumn("_wfp", fp)
            .filter(F.col("_pos") + length <= F.col("_len"))
        )
        return (
            fps.groupBy("_wfp")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") >= 2)
            .limit(1)
            .count()
            > 0
        )

    if not has_dup(lo):
        return 0
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if has_dup(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def _global_dense_rank(
    df: DataFrame, key_cols: list[str], out_col: str
) -> tuple[DataFrame, int]:
    """Order-preserving dense rank over arbitrary volume WITHOUT a
    single-reducer global window: range-repartition on the key (equal
    keys co-locate, partition index order == key order), dense_rank
    inside each partition (parallel), then shift each partition by the
    exclusive prefix sum of per-partition distinct-key counts — a
    driver-side table bounded at one row per partition. The input is
    eagerly localCheckpoint-ed first so the offset collect and the
    downstream consumers see the SAME range boundaries (range
    partitioning samples; recomputation could re-draw boundaries and
    silently skew every rank). Returns (ranked df, distinct-key
    count) — the count falls out of the offset arithmetic for free and
    drives the caller's fixed-point early exit."""
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = df.repartitionByRange(n_part, *[F.col(c) for c in key_cols])
    local = part.withColumn("_sa_pid", F.spark_partition_id()).withColumn(
        "_sa_lr",
        F.dense_rank().over(Window.partitionBy("_sa_pid").orderBy(*key_cols)),
    )
    local = local.localCheckpoint(eager=True)
    sizes = {
        r["_sa_pid"]: r["_n"]
        for r in local.groupBy("_sa_pid").agg(F.max("_sa_lr").alias("_n")).collect()
    }
    acc = 0
    pairs: list[Column] = []
    for pid in sorted(sizes):
        pairs.extend([F.lit(pid), F.lit(acc)])
        acc += sizes[pid]
    omap = F.create_map(*pairs) if pairs else None
    off = omap[F.col("_sa_pid")] if omap is not None else F.lit(0)
    out = local.withColumn(
        out_col, (F.col("_sa_lr") + F.coalesce(off, F.lit(0))).cast("long")
    ).drop("_sa_pid", "_sa_lr")
    return out, acc


def suffix_array(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, rank): the lexicographic rank of every token suffix
    docs[id][pos:] across the whole corpus — the distributed suffix
    array (Manber-Myers prefix doubling; Flick & Aluru 2015's
    distributed formulation). Ranks are dense over DISTINCT suffix
    contents: equal suffixes (identical token tails in different
    documents) share a rank, which is exactly what duplicate analysis
    wants; add (id, pos) tiebreak downstream for a strict permutation.

    Each doubling level: one per-document ``lead`` (suffix[p]'s order
    key becomes (rank_k[p], rank_k[p+2^k]), -1 when past the end — the
    end-of-document sentinel sorts before every real rank, giving true
    suffix order for short tails) and one :func:`_global_dense_rank`.
    At most ceil(log2(max doc length)) rounds — O(N log maxdoc)
    shuffle volume with no per-doc-length driver state — but the loop
    exits at the REFINEMENT FIXED POINT: if a round splits no class
    (distinct-rank count unchanged, read off the dense rank's offset
    arithmetic for free), no later round can (classes closed under
    shift by 2^k are closed under every longer shift — the standard
    Manber-Myers early exit). Natural text separates most suffixes
    within a few rounds, so this typically halves the round count."""
    tk = _tokens_table(docs, id_col, text_col)
    # Rank the RAW token at level 0 (not its md5 — hashing would
    # scramble the lexicographic order the suffix array promises).
    pos = tk.select(
        "_id",
        F.size("_tk").alias("_len"),
        F.posexplode("_tk").alias("_pos", "_key"),
    )
    ranked, n_classes = _global_dense_rank(pos, ["_key"], "_r")
    ranked = ranked.drop("_key")
    maxlen = int(ranked.agg(F.max("_len")).first()[0] or 0)
    w = _doc_window()
    half = 1
    while half < maxlen:
        nxt = F.coalesce(F.lead("_r", half).over(w), F.lit(-1).cast("long"))
        keyed = ranked.select("_id", "_pos", "_len", "_r", nxt.alias("_r2"))
        ranked, n_new = _global_dense_rank(keyed, ["_r", "_r2"], "_rn")
        ranked = ranked.select("_id", "_pos", "_len", F.col("_rn").alias("_r"))
        if n_new == n_classes:  # fixed point: no class split this round
            break
        n_classes = n_new
        half *= 2
    return ranked.select(
        F.col("_id").alias(id_col),
        F.col("_pos").alias("pos"),
        (F.col("_r") - 1).alias("rank"),
    )
