"""Training-objective data preparation — the last mile between a
curated corpus and a training run:

- :func:`span_corrupt`: T5-style span corruption (Raffel et al. 2020
  §3.1.4 / 3.3.4): mask ~``noise_density`` of each document's tokens
  in spans of mean length ``mean_span_len``, emit the
  sentinel-rewritten (input, target) pair. Randomness is
  md5-derived per (seed, doc, position) — the repo's deterministic
  sampling convention (operators/sampling.py) — so the same corpus +
  seed always yields the same masking, re-runs are reproducible, and
  the whole construction replays in DuckDB (the conv/substring/md5
  identity the sampling oracles pin).
- :func:`render_chat`: SFT chat-template rendering (ChatML framing):
  array<struct<role, content>> conversations → one training text plus
  assistant-content character spans for loss masking — the structure
  every instruction-tuning data loader needs.
- :func:`fim_transform`: fill-in-the-middle rearrangement (Bavarian
  et al. 2022, arXiv:2207.14255) — the code-model pretraining
  objective: a deterministic md5-selected fraction of documents is
  split at two md5-derived character cuts into (prefix, middle,
  suffix) and re-serialized with FIM sentinels in PSM or SPM order.
- :func:`preference_pairs`: best-vs-worst pairwise preference
  construction (reward-model / DPO training data) with deterministic
  tie-breaking and margin gating — the one aggregation-shaped stage
  here (map-side-combinable max_by/min_by per prompt).

All are single-projection, zero-shuffle, embarrassingly row-parallel
— they scale with the scan at 100 TB. ``render_chat`` and
``fim_transform`` are pure Column-expression rewrites;
``span_corrupt`` is an Arrow-batched pandas kernel (its docstring
records the measured 54× case against the Column-expression form).
Reference parity: the reference engine stops at transport codecs
(pkg/internal/codec); these stages belong to the LLM-training battery
this repo adds on top.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h32(seed: int, id_col: Column, i: Column, tag: str) -> Column:
    """Deterministic 32-bit uniform from md5 over ``seed:id:pos:tag``
    — identical digits in DuckDB via CAST('0x'||substr(md5(..),1,8) AS
    BIGINT), the proven cross-engine identity."""
    key = F.concat_ws(
        ":", F.lit(str(seed)), id_col.cast("string"), i.cast("string"), F.lit(tag)
    )
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def span_corrupt(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    noise_density: float = 0.15,
    mean_span_len: int = 3,
    seed: int = 0,
) -> DataFrame:
    """T5 span corruption over whitespace tokens. Per position i, a
    span STARTS iff md5(seed,id,i,'s') < noise_density/mean_span_len
    of the 32-bit range, with length 1 + md5(seed,id,i,'l') %
    (2·mean_span_len − 1) (uniform on [1, 2m−1], mean m — the
    discrete stand-in for T5's Poisson(3)); overlapping spans merge.
    Expected masked fraction ≈ noise_density. Output per doc:

    - ``input_text``: tokens with each merged span replaced by one
      ``<extra_id_k>`` sentinel (k in first-occurrence order),
    - ``target_text``: each sentinel followed by the tokens it hid,
      closed by the final ``<extra_id_n>`` sentinel (T5's format),
    - ``n_spans`` / ``n_masked`` diagnostics.

    Empty/NULL documents pass through with empty input/target and 0
    counts. One projection, no shuffle: an Arrow-batched pandas UDF —
    the repo's sanctioned shape for data-dependent sequential token
    logic (the bpe_encode/unigram_encode contract). hashlib md5 equals
    Spark's and DuckDB's md5 on the same key strings, so the masking
    stays cross-engine replayable (the conv/substring identity the
    sampling oracles pin) and the plain-Python test reference is
    bit-equal by construction.

    Rejected alternative (measured r7, sf0.1 documents, 5000 docs ×
    ~54 tokens): the pure Column-expression construction (per-position
    exists() probes over a starts array, md5-derived span lengths
    re-hashed inside every probe, interpreted higher-order lambdas)
    ran 54.9 s single-task — ~11 ms/doc of expression-interpreter
    overhead; this kernel does the same work in well under a second.
    Column expressions are the right default, but a per-token
    sequential rewrite with data-dependent spans is exactly the case
    the UDF escape hatch exists for."""
    import hashlib

    p_thr = int(noise_density / mean_span_len * (1 << 32))
    width = 2 * mean_span_len - 1

    out_type = (
        "input_text string, target_text string, n_spans int, n_masked int"
    )

    @F.pandas_udf(out_type)
    def _corrupt(ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
        def h32(did: str, i: int, tag: str) -> int:
            key = f"{seed}:{did}:{i}:{tag}"
            return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)

        inp_o, tgt_o, ns_o, nm_o = [], [], [], []
        for did, text in zip(ids, texts):
            toks = text.split() if text else []
            n = len(toks)
            if n == 0:
                inp_o.append("")
                tgt_o.append("")
                ns_o.append(0)
                nm_o.append(0)
                continue
            starts = [i for i in range(n) if h32(did, i, "s") < p_thr]
            masked = [False] * n
            for s in starts:
                ln = 1 + h32(did, s, "l") % width
                for i in range(s, min(s + ln, n)):
                    masked[i] = True
            inp, tgt, k, n_masked = [], [], -1, 0
            for i in range(n):
                if not masked[i]:
                    inp.append(toks[i])
                    continue
                n_masked += 1
                if i == 0 or not masked[i - 1]:
                    k += 1
                    sent = f"<extra_id_{k}>"
                    inp.append(sent)
                    tgt.append(sent)
                tgt.append(toks[i])
            n_spans = k + 1
            if n_spans:
                tgt.append(f"<extra_id_{n_spans}>")
            inp_o.append(" ".join(inp))
            tgt_o.append(" ".join(tgt) if n_spans else "")
            ns_o.append(n_spans)
            nm_o.append(n_masked)
        return pd.DataFrame(
            {
                "input_text": inp_o,
                "target_text": tgt_o,
                "n_spans": ns_o,
                "n_masked": nm_o,
            }
        )

    res = _corrupt(F.col(id_col).cast("string"), F.col(text_col))
    tmp = df.withColumn("_sc", res)
    return (
        tmp.withColumn("input_text", F.col("_sc.input_text"))
        .withColumn("target_text", F.col("_sc.target_text"))
        .withColumn("n_spans", F.col("_sc.n_spans"))
        .withColumn("n_masked", F.col("_sc.n_masked"))
        .drop("_sc")
    )


# FIM sentinel tokens (public convention from the SantaCoder /
# StarCoder model cards; any literal sentinel triple slots in).
_FIM_PRE = "<|fim_prefix|>"
_FIM_SUF = "<|fim_suffix|>"
_FIM_MID = "<|fim_middle|>"


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fim_rate: float = 0.5,
    mode: str = "psm",
    seed: int = 0,
    out_col: str = "fim_text",
) -> DataFrame:
    """Fill-in-the-middle document rearrangement (Bavarian et al.
    2022, arXiv:2207.14255 §2) over character offsets.

    Per document: selected iff ``md5(seed:id:0:f)`` (32-bit prefix) <
    ``fim_rate`` of the range — the repo's deterministic sampling
    convention, so the transformed subset is a pure function of
    (corpus, seed), reproducible across runs and replayable in DuckDB
    via the proven ``CAST('0x'||substr(md5(..),1,8) AS BIGINT)``
    identity. Two cut points are drawn uniformly on [0, len] the same
    way (tags ``a``/``b``, sorted), splitting the text into
    ``prefix = text[0:c1)``, ``middle = text[c1:c2)``,
    ``suffix = text[c2:len)``. Serialization:

    - ``psm``:  ``<|fim_prefix|>P<|fim_suffix|>S<|fim_middle|>M``
    - ``spm`` (the paper's joined SPM variant): ``<|fim_prefix|>``
      ``<|fim_suffix|>S<|fim_middle|>PM`` — prefix and middle stay
      contiguous so the model sees an uninterrupted P→M span.

    Unselected, NULL, and empty documents pass through unchanged
    (``fim_applied`` false). Output adds ``out_col`` plus the
    ``fim_applied`` flag; the original ``text_col`` is untouched, so
    the original document reassembles exactly from the three segments
    — pinned in tests.

    Pure Column expressions (substring arithmetic) — zero shuffle,
    zero Python; the transform rides the corpus scan at 100 TB. Both
    cut draws hash (seed, id) only, not positions, so cost is O(1)
    per row regardless of document length.
    """
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    sel_thr = int(fim_rate * (1 << 32))
    text = F.col(text_col)
    did = F.col(id_col)
    n = F.length(text)

    selected = (
        text.isNotNull()
        & (n > 0)
        & (_h32(seed, did, F.lit(0), "f") < F.lit(sel_thr))
    )
    u1 = _h32(seed, did, F.lit(0), "a") % (n + 1)
    u2 = _h32(seed, did, F.lit(0), "b") % (n + 1)
    c1 = F.least(u1, u2)
    c2 = F.greatest(u1, u2)
    # 1-based substring, char semantics — identical in DuckDB.
    prefix = F.substring(text, F.lit(1), c1)
    middle = F.substring(text, c1 + 1, c2 - c1)
    suffix = F.substring(text, c2 + 1, n - c2)
    if mode == "psm":
        rendered = F.concat(
            F.lit(_FIM_PRE), prefix, F.lit(_FIM_SUF), suffix, F.lit(_FIM_MID), middle
        )
    else:
        rendered = F.concat(
            F.lit(_FIM_PRE),
            F.lit(_FIM_SUF),
            suffix,
            F.lit(_FIM_MID),
            prefix,
            middle,
        )
    return df.withColumn(
        out_col, F.when(selected, rendered).otherwise(text)
    ).withColumn("fim_applied", selected)


# ChatML framing tokens (public convention; any template with literal
# prefix/suffix per role slots into the same fold).
_IM_START = "<|im_start|>"
_IM_END = "<|im_end|>"


def render_chat(
    df: DataFrame,
    messages_col: str = "messages",
    mask_roles: tuple[str, ...] = ("assistant",),
    out_col: str = "chat_text",
) -> DataFrame:
    """Render ``array<struct<role,content>>`` conversations to one
    ChatML training text and the loss-mask spans an SFT loader needs:

    - ``chat_text``: ``<|im_start|>role\\ncontent<|im_end|>\\n`` per
      turn, in order.
    - ``loss_spans``: array<struct<start,end>> — 0-based character
      [start, end) ranges of the CONTENT of every turn whose role is
      in ``mask_roles`` (the tokens trained on; prompt/system/user
      turns stay masked out). Offsets are over ``chat_text`` exactly,
      so ``substring(chat_text, start+1, end-start)`` is the turn
      content — pinned in tests.
    - ``n_turns`` / ``n_loss_turns`` diagnostics.

    One aggregate fold per row (linear, interpreted), no shuffle.
    DuckDB replays the fold with list_reduce over the same struct
    accumulator."""
    msgs = F.col(messages_col)

    acc0 = F.struct(
        F.lit("").alias("text"),
        F.expr("CAST(array() AS array<struct<start:int,end:int>>)").alias("spans"),
    )

    def step(acc: Column, m: Column) -> Column:
        prefix = F.concat(F.lit(_IM_START), m["role"], F.lit("\n"))
        start = F.length(acc["text"]) + F.length(prefix)
        end = start + F.length(m["content"])
        seg = F.concat(prefix, m["content"], F.lit(_IM_END + "\n"))
        span = F.struct(
            start.cast("int").alias("start"), end.cast("int").alias("end")
        )
        return F.struct(
            F.concat(acc["text"], seg).alias("text"),
            F.when(
                m["role"].isin(*mask_roles), F.concat(acc["spans"], F.array(span))
            )
            .otherwise(acc["spans"])
            .alias("spans"),
        )

    folded = F.aggregate(msgs, acc0, step)
    return (
        df.withColumn(out_col, folded["text"])
        .withColumn("loss_spans", folded["spans"])
        .withColumn("n_turns", F.size(msgs))
        .withColumn("n_loss_turns", F.size(folded["spans"]))
    )


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt",
    response_col: str = "response",
    score_col: str = "score",
    min_margin: float = 0.0,
) -> DataFrame:
    """Pairwise preference construction for reward-model / DPO
    training: per prompt, the highest-scored response becomes
    ``chosen`` and the lowest-scored ``rejected`` (best-vs-worst — the
    standard margin-maximizing pairing), with deterministic (score,
    response) struct ordering so score ties cannot flap between runs.
    Prompts whose margin (score_chosen − score_rejected) is below
    ``min_margin`` — including single-response and all-tied prompts at
    margin 0 when ``min_margin`` > 0 — are dropped; pairs where chosen
    equals rejected (one distinct response) are always dropped.

    One map-side-combinable groupBy over the candidate table (max_by /
    min_by partial-aggregate per input partition before the shuffle —
    a prompt with 10⁴ candidate responses ships one row per partition,
    not 10⁴). Exactly replayable in DuckDB via arg_max/arg_min over
    the same (score, response) ordering."""
    sc = F.col(score_col).cast("double")
    key = F.struct(sc.alias("s"), F.col(response_col).alias("r"))
    agg = df.groupBy(prompt_col).agg(
        F.max_by(F.col(response_col), key).alias("chosen"),
        F.min_by(F.col(response_col), key).alias("rejected"),
        F.max(sc).alias("score_chosen"),
        F.min(sc).alias("score_rejected"),
    )
    return agg.withColumn(
        "margin", F.round(F.col("score_chosen") - F.col("score_rejected"), 6)
    ).filter(
        (F.col("chosen") != F.col("rejected"))
        & (F.col("margin") >= F.lit(min_margin))
    )
