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

Both are pure Column expressions over per-row arrays (interpreted
higher-order lambdas — no Python workers, no shuffle): embarrassingly
row-parallel, so they scale with the scan at 100 TB. Reference parity:
the reference engine stops at transport codecs (pkg/internal/codec);
these stages belong to the LLM-training battery this repo adds on top.
"""

from __future__ import annotations

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

    Empty documents pass through with empty input/target and 0 counts.
    One projection, no shuffle; the md5 calls are codegen'd, the array
    fold is interpreted but linear in document length."""
    p_thr = int(noise_density / mean_span_len * (1 << 32))
    width = 2 * mean_span_len - 1
    idc = F.col(id_col)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    # sequence(0, -1) would yield [0, -1] (descending step inference),
    # so empty docs get an explicitly empty position array.
    pos = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.expr("CAST(array() AS array<int>)")
    )

    def len_of(i: Column) -> Column:
        return F.lit(1) + _h32(seed, idc, i, "l") % F.lit(width)

    starts = F.filter(pos, lambda i: _h32(seed, idc, i, "s") < F.lit(p_thr))

    def masked(i: Column) -> Column:
        return F.exists(starts, lambda s: (s <= i) & (s + len_of(s) > i))

    def new_span(i: Column) -> Column:
        return masked(i) & ((i == 0) | ~masked(i - 1))

    # Merged-span starts in order; sentinel index of position i = rank
    # of the last span start at or before i.
    span_starts = F.filter(pos, new_span)

    def sent_of(i: Column) -> Column:
        k = F.size(F.filter(span_starts, lambda s: s <= i)) - 1
        return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))

    def tok(i: Column) -> Column:
        return F.element_at(toks, i + 1)

    inp = F.array_join(
        F.filter(
            F.transform(
                pos,
                lambda i: F.when(~masked(i), tok(i))
                .when(new_span(i), sent_of(i))
                .otherwise(F.lit(None)),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    tgt_body = F.array_join(
        F.filter(
            F.transform(
                pos,
                lambda i: F.when(new_span(i), F.concat(sent_of(i), F.lit(" "), tok(i)))
                .when(masked(i), tok(i))
                .otherwise(F.lit(None)),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    n_spans = F.size(span_starts)
    closing = F.concat(F.lit("<extra_id_"), n_spans.cast("string"), F.lit(">"))
    tgt = F.when(n_spans > 0, F.concat(tgt_body, F.lit(" "), closing)).otherwise(
        F.lit("")
    )
    n_masked = F.size(F.filter(pos, masked))
    empty = n <= 0
    return (
        df.withColumn("input_text", F.when(empty, F.lit("")).otherwise(inp))
        .withColumn("target_text", F.when(empty, F.lit("")).otherwise(tgt))
        .withColumn("n_spans", F.when(empty, F.lit(0)).otherwise(n_spans))
        .withColumn("n_masked", F.when(empty, F.lit(0)).otherwise(n_masked))
    )


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
