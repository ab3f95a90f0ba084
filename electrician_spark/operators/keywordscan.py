"""Large-vocabulary keyword scanning — the scale path of the keyword
filter family (Aho & Corasick 1975). ``scalar.contains_any`` compiles
one boolean codegen expression per keyword: ideal for the reference's
handful of filter terms, O(terms · text) for a blocklist. Curation
blocklists (URL categories, safety word lists, PII dictionaries) run
to 10⁴–10⁵ terms, where the automaton's O(text + matches) single pass
is the only shape that survives 100 TB.

Implementation: a plain-dict Aho-Corasick automaton (goto / fail /
output links, built breadth-first) compiled ONCE on the driver and
shipped to executors in the UDF closure (the broadcast-small-side
discipline: the automaton is vocabulary-sized, never corpus-sized).
Matching runs in an Arrow-batched pandas UDF — data-dependent
per-character state stepping is exactly the sanctioned UDF case
(see span_corrupt's measured rationale). Equality with the codegen
``contains_any`` expression is test-pinned on random corpora.
"""

from __future__ import annotations

from collections import deque

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_automaton(terms: list[str]) -> tuple[list[dict], list[int], list[list[int]]]:
    """Compile terms into (goto, fail, out): goto[s] maps char→state,
    fail[s] is the longest proper suffix state, out[s] lists term
    indexes ending at s (including via fail links). Deterministic;
    duplicate terms keep the first index."""
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
    """Term indexes present in ``text`` — one pass, O(len + matches)."""
    s = 0
    hits: set[int] = set()
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            hits.update(out[s])
    return hits


def keyword_hits(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    out_col: str = "keyword_hits",
) -> DataFrame:
    """Append ``out_col``: the sorted distinct list of matched terms
    per row (empty array when clean, NULL text → NULL). One corpus
    scan regardless of vocabulary size."""
    auto = build_automaton(terms)
    tarr = list(terms)

    @F.pandas_udf("array<string>")
    def _scan(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            return sorted({tarr[i] for i in scan_text(t, *auto)})

        return texts.map(one)

    return df.withColumn(out_col, _scan(F.col(text_col)))


def contains_any_scaled(
    df: DataFrame, terms: list[str], text_col: str = "text", out_col: str = "flagged"
) -> DataFrame:
    """Boolean form — drop-in for ``scalar.contains_any`` at blocklist
    scale (equality with the codegen expression is test-pinned)."""
    auto = build_automaton(terms)

    @F.pandas_udf("boolean")
    def _any(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            s = 0
            goto, fail, out = auto
            for ch in t:
                while s and ch not in goto[s]:
                    s = fail[s]
                s = goto[s].get(ch, 0)
                if out[s]:
                    return True
            return False

        return texts.map(one)

    return df.withColumn(out_col, _any(F.col(text_col)))
