"""Large-vocabulary keyword scanning — the scale path of the keyword
filter family (Aho & Corasick 1975). ``scalar.contains_any`` compiles
one boolean codegen expression per keyword: ideal for the reference's
handful of filter terms, O(terms · text) for a blocklist. Curation
blocklists (URL categories, safety word lists, PII dictionaries) run
to 10⁴–10⁵ terms, where the automaton's O(text + matches) single pass
is the only shape that survives 100 TB.

Representation (r15): the automaton is flattened to numpy arrays and
shipped via ``SparkContext.broadcast`` — never in the UDF closure.
The r14 vocab-axis measurement (SCALE.md: 1k terms 4.14 s / 10k
4.62 s / 100k 12.7 s over 80k docs) named the 100k-term constant as
closure-ship + dict-of-dicts cache pressure: a million-state automaton
of nested Python dicts re-pickles into every task ship and thrashes
cache during stepping. The flat form is:

- a **class-compressed dense DFA**: ``delta[S, A+1]`` int32 where A is
  the number of distinct code points across the vocabulary (column A =
  "any other character" → root). Fail links are pre-resolved into the
  table (BFS row-copy from the fail state), so stepping is one gather
  per character with NO fail-chasing loop.
- CSR output lists ``(out_indptr, out_terms)`` + an ``out_any`` bool
  mask, carrying term indexes reachable at each state via fail links.

Matching is **vectorized across the rows of each Arrow batch**: texts
are decoded to code-point arrays (UTF-32), classes resolved with one
``searchsorted`` per text, then all texts step their DFA position
simultaneously — position ``i`` of every active text advances with a
single fancy-gather on the flat table. Python-level iteration count is
max(text length) per batch, not total characters. A scalar tail loop
finishes the few longest texts once the active set is small, so one
megabyte-long outlier doesn't pin the vectorized loop at width 1.

When the dense table would exceed ``DENSE_BUDGET_BYTES`` (deep
multilingual vocabularies: states × alphabet blows up while actual
trie edges stay linear), the scanner falls back to the dict automaton
— still broadcast, never closure-shipped.

Equality with the codegen ``contains_any`` expression and with the
reference dict stepping is test-pinned on random corpora
(tests/test_keywordscan.py).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict, deque
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dense-DFA size cap: states × (alphabet+1) × 4 bytes. 256 MB covers a
# ~1M-state / 64-char-class vocabulary (100k ASCII-ish terms); beyond
# it the dict fallback keeps memory linear in trie edges.
DENSE_BUDGET_BYTES = 256 << 20

# Below this many still-active texts the vectorized stepper's fixed
# per-position overhead (a few numpy calls on tiny arrays) loses to a
# plain per-character loop over the same flat table.
_SCALAR_TAIL_CUTOFF = 24


def build_automaton(terms: list[str]) -> tuple[list[dict], list[int], list[list[int]]]:
    """Compile terms into (goto, fail, out): goto[s] maps char→state,
    fail[s] is the longest proper suffix state, out[s] lists term
    indexes ending at s (including via fail links). Deterministic;
    duplicate terms share an output state and every duplicate's index
    is recorded (callers resolving to strings dedupe by term)."""
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for ti, term in enumerate(terms):
        if not term:
            raise ValueError("empty keyword")
        s = 0
        for ch in term:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(ti)
    fail = [0] * len(goto)
    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        for ch, t in goto[s].items():
            q.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
            out[t] = out[t] + out[fail[t]]
    return goto, fail, out


def scan_text(text: str, goto: list[dict], fail: list[int], out: list[list[int]]) -> set[int]:
    """Term indexes present in ``text`` — one pass, O(len + matches).
    Reference dict stepping; the flat scanner is pinned equal to it."""
    s = 0
    hits: set[int] = set()
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            hits.update(out[s])
    return hits


class FlatAutomaton(NamedTuple):
    """Dense class-compressed DFA + CSR outputs (see module docstring).
    Pickles as raw numpy buffers — broadcast-cheap at any vocab size."""

    alphabet: np.ndarray  # uint32[A], sorted distinct code points
    delta: np.ndarray     # int32[S, A+1]; fail links pre-resolved; col A → 0
    out_any: np.ndarray   # bool[S]
    out_indptr: np.ndarray  # int64[S+1]
    out_terms: np.ndarray   # int32[M]


def flatten_automaton(
    goto: list[dict], fail: list[int], out: list[list[int]]
) -> FlatAutomaton:
    """Flatten a dict automaton into the dense DFA form. Fail links are
    resolved into the transition rows (delta[s] starts as a copy of
    delta[fail[s]], BFS order guarantees the fail row is final first),
    so the stepper never chases fail pointers."""
    alphabet = np.array(
        sorted({ord(ch) for row in goto for ch in row}), dtype=np.uint32
    )
    a_n = len(alphabet)
    cls_of = {int(cp): i for i, cp in enumerate(alphabet)}
    s_n = len(goto)
    delta = np.zeros((s_n, a_n + 1), dtype=np.int32)
    for ch, t in goto[0].items():
        delta[0, cls_of[ord(ch)]] = t
    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        delta[s, :a_n] = delta[fail[s], :a_n]
        for ch, t in goto[s].items():
            delta[s, cls_of[ord(ch)]] = t
            q.append(t)
    lengths = np.fromiter((len(o) for o in out), dtype=np.int64, count=s_n)
    out_indptr = np.zeros(s_n + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_indptr[1:])
    out_terms = np.fromiter(
        (ti for o in out for ti in o), dtype=np.int32, count=int(out_indptr[-1])
    )
    return FlatAutomaton(alphabet, delta, lengths > 0, out_indptr, out_terms)


def _flatten_if_in_budget(goto, fail, out) -> FlatAutomaton | None:
    """Flatten when the dense table fits ``DENSE_BUDGET_BYTES``."""
    alpha = {ch for row in goto for ch in row}
    if len(goto) * (len(alpha) + 1) * 4 > DENSE_BUDGET_BYTES:
        return None
    return flatten_automaton(goto, fail, out)


def build_flat_automaton(terms: list[str]) -> FlatAutomaton | None:
    """Dense flat automaton for ``terms``, or None when the dense table
    would exceed ``DENSE_BUDGET_BYTES`` (caller falls back to dicts)."""
    return _flatten_if_in_budget(*build_automaton(terms))


def _classes(codes: np.ndarray, alphabet: np.ndarray) -> np.ndarray:
    """Map code points to alphabet classes; unknown chars → class A
    (the always-to-root column). One searchsorted per text."""
    a_n = len(alphabet)
    if a_n == 0:  # empty vocabulary: every char is "other" → root
        return np.zeros(len(codes), dtype=np.int64)
    idx = np.searchsorted(alphabet, codes)
    safe = np.minimum(idx, a_n - 1)
    known = (idx < a_n) & (alphabet[safe] == codes)
    return np.where(known, idx, a_n).astype(np.int64)


def scan_batch_flat(texts: list, flat: FlatAutomaton) -> list:
    """Matched term-index sets for each text (None in → None out) —
    the batch form of ``scan_text``. All texts in the batch step their
    DFA simultaneously: position i advances every active text with one
    gather on the flat transition table; matched (text, state) pairs
    accumulate as array chunks and resolve to term indexes through the
    CSR output lists in one vectorized pass at the end — no per-hit
    Python inside the stepping loop."""
    a_n = len(flat.alphabet)
    width = a_n + 1
    deltaf = flat.delta.ravel()
    out_any = flat.out_any
    results: list = [None] * len(texts)
    live_idx: list[int] = []
    code_arrays: list[np.ndarray] = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        live_idx.append(i)
        code_arrays.append(np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32))
        results[i] = set()
    if not live_idx:
        return results
    lens = np.fromiter((len(c) for c in code_arrays), dtype=np.int64, count=len(live_idx))
    order = np.argsort(-lens, kind="stable")
    sorted_lens = lens[order]
    neg_lens = -sorted_lens
    total = int(lens.sum())
    if total == 0:
        return results
    # one alphabet lookup for the whole batch, texts laid out in
    # longest-first order so position i of the active set is one gather
    flat_cls = _classes(
        np.concatenate([code_arrays[j] for j in order]), flat.alphabet
    )
    starts = np.zeros(len(order), dtype=np.int64)
    np.cumsum(sorted_lens[:-1], out=starts[1:])
    state = np.zeros(len(order), dtype=np.int64)
    hit_j: list[np.ndarray] = []  # chunks of indexes into `order`
    hit_s: list[np.ndarray] = []  # matching state chunks
    pos = 0
    max_len = int(sorted_lens[0])
    while pos < max_len:
        k = int(np.searchsorted(neg_lens, -pos, side="left"))  # texts with len > pos
        if k == 0:
            break
        if k < _SCALAR_TAIL_CUTOFF:
            # Few long texts left: a tight per-char loop beats the
            # vectorized stepper's per-position numpy overhead.
            for j in range(k):
                s = int(state[j])
                seen: set = set()
                seg = flat_cls[starts[j] + pos : starts[j] + int(sorted_lens[j])]
                for c in seg.tolist():
                    s = int(deltaf[s * width + c])
                    if out_any[s]:
                        seen.add(s)
                if seen:
                    hit_j.append(np.full(len(seen), j, dtype=np.int64))
                    hit_s.append(np.fromiter(seen, dtype=np.int64, count=len(seen)))
            break
        col = flat_cls[starts[:k] + pos]
        state[:k] = deltaf[state[:k] * width + col]
        hit = out_any[state[:k]]
        if hit.any():
            nz = np.flatnonzero(hit)
            hit_j.append(nz)
            hit_s.append(state[nz])
        pos += 1
    if not hit_j:
        return results
    # resolve (text, state) → term indexes, vectorized: dedupe pairs,
    # expand each state's CSR out-slice with a repeat/arange gather,
    # dedupe (text, term) pairs, then split per text
    jj = np.concatenate(hit_j)
    ss = np.concatenate(hit_s)
    s_n = flat.delta.shape[0]
    pair = np.unique(jj * s_n + ss)
    u_j, u_s = pair // s_n, pair % s_n
    counts = (flat.out_indptr[u_s + 1] - flat.out_indptr[u_s]).astype(np.int64)
    n_terms_total = int(counts.sum())
    if n_terms_total == 0:
        return results
    rep_j = np.repeat(u_j, counts)
    csr_start = np.repeat(flat.out_indptr[u_s], counts)
    intra = np.arange(n_terms_total) - np.repeat(np.cumsum(counts) - counts, counts)
    term_idx = flat.out_terms[csr_start + intra].astype(np.int64)
    n_vocab = int(flat.out_terms.max()) + 1 if len(flat.out_terms) else 1
    tpair = np.unique(rep_j * n_vocab + term_idx)
    t_j, t_t = tpair // n_vocab, tpair % n_vocab
    bounds = np.searchsorted(t_j, np.arange(len(order) + 1))
    for j in range(len(order)):
        lo, hi = bounds[j], bounds[j + 1]
        if lo < hi:
            results[live_idx[order[j]]] = set(t_t[lo:hi].tolist())
    return results


# One broadcast per (session, vocabulary): a pipeline that calls the
# scanner repeatedly — a rebuilt DataFrame per run, or a streaming
# foreachBatch re-planning each micro-batch — must NOT ship a fresh
# multi-MB broadcast every call (measured: five re-broadcasts of a
# 75 MB 100k-term automaton degraded scan time 15 s → 61 s as JVM +
# python-worker caches filled). Evicted entries are unpersisted.
_BC_CACHE: OrderedDict = OrderedDict()
_BC_CACHE_MAX = 8


def _automaton_broadcast(sc, terms: list[str]):
    """Broadcast (flat_automaton | None, dict_automaton | None, terms)
    for the vocabulary, cached per (application, vocabulary digest)."""
    # length-prefixed digest: no separator byte a term could contain,
    # so distinct vocabularies can't collide (e.g. ['a','b'] vs ['a\x00b'])
    h = hashlib.md5()
    for t in terms:
        b = t.encode()
        h.update(len(b).to_bytes(4, "big"))
        h.update(b)
    key = (sc.applicationId, h.hexdigest(), DENSE_BUDGET_BYTES)
    bc = _BC_CACHE.get(key)
    if bc is None:
        auto = build_automaton(terms)  # built ONCE; reused by the fallback
        flat = _flatten_if_in_budget(*auto)
        bc = sc.broadcast((flat, None if flat is not None else auto, list(terms)))
        _BC_CACHE[key] = bc
        while len(_BC_CACHE) > _BC_CACHE_MAX:
            _, old = _BC_CACHE.popitem(last=False)
            try:
                old.unpersist()
            except Exception:
                pass  # stopped context: nothing to release
    else:
        _BC_CACHE.move_to_end(key)
    return bc


def keyword_hits(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    out_col: str = "keyword_hits",
) -> DataFrame:
    """Append ``out_col``: the sorted distinct list of matched terms
    per row (empty array when clean, NULL text → NULL). One corpus
    scan regardless of vocabulary size; the automaton rides a cached
    broadcast, not the UDF closure."""
    bc = _automaton_broadcast(df.sparkSession.sparkContext, terms)

    @F.pandas_udf("array<string>")
    def _scan(texts: pd.Series) -> pd.Series:
        fa, auto, words = bc.value
        if fa is not None:
            hits = scan_batch_flat(texts.tolist(), fa)
            return pd.Series(
                [None if h is None else sorted({words[i] for i in h}) for h in hits]
            )

        def one(t):  # over-budget dense table: dict stepping
            if t is None:
                return None
            return sorted({words[i] for i in scan_text(t, *auto)})

        return texts.map(one)

    return df.withColumn(out_col, _scan(F.col(text_col)))


def contains_any_scaled(
    df: DataFrame, terms: list[str], text_col: str = "text", out_col: str = "flagged"
) -> DataFrame:
    """Boolean form — drop-in for ``scalar.contains_any`` at blocklist
    scale (equality with the codegen expression is test-pinned)."""
    bc = _automaton_broadcast(df.sparkSession.sparkContext, terms)

    @F.pandas_udf("boolean")
    def _any(texts: pd.Series) -> pd.Series:
        fa, auto, _ = bc.value
        if fa is not None:
            hits = scan_batch_flat(texts.tolist(), fa)
            return pd.Series([None if h is None else bool(h) for h in hits])
        goto, fail, out = auto

        def one(t):
            if t is None:
                return None
            s = 0
            for ch in t:
                while s and ch not in goto[s]:
                    s = fail[s]
                s = goto[s].get(ch, 0)
                if out[s]:
                    return True
            return False

        return texts.map(one)

    return df.withColumn(out_col, _any(F.col(text_col)))
