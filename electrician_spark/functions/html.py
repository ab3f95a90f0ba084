"""HTML main-content extraction (boilerplate removal) as pure Column
expressions — the web-crawl pipeline stage that runs BEFORE every text
quality/dedup operator in this repo: raw crawled HTML → per-block
features (length, link density, stopword density) → jusText-style
good/bad classification (Pomikálek 2011's core heuristic, simplified
to the deterministic, language-list-free subset) → main text.

Reference parity: the reference engine decodes HTML payloads as markup
rows (codec/html.go) but has no content-extraction stage; this module
is part of the LLM-training-data battery (C4/RefinedWeb pipelines run
trafilatura/jusText here). Everything is JVM-side codegen'd or
interpreted Column expressions over per-row arrays — no Python worker,
no shuffle: the operator is embarrassingly row-parallel at 100 TB.

Portability: every regex is RE2-compatible (no backreferences, no
lookarounds), so the whole stage replays in DuckDB (regexp_replace
with 'gis' flags + list_transform/list_filter) — the q_c4_1 oracle
posture. The plain-Python reference in tests/test_html.py pins
equality over crafted pages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-level elements: a tag boundary of any of these ends the current
# text block (open or close, with attributes, self-closing or not).
_BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|"
    "section|article|main|header|footer|nav|aside|blockquote|pre|figure|"
    "figcaption|form|fieldset|hr|br|title"
)
_BLOCK_BOUNDARY = rf"(?i)</?(?:{_BLOCK_TAGS})(?:\s[^>]*)?/?>"
# Containers whose CONTENT is never text (dropped wholesale, non-greedy,
# per-container patterns — RE2 has no backreferences).
_DROP_CONTENT = tuple(
    rf"(?is)<{t}(?:\s[^>]*)?>.*?</{t}>" for t in ("script", "style", "noscript", "svg", "textarea")
)
_COMMENT = r"(?s)<!--.*?-->"
_ANCHOR = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"
_ANY_TAG = r"(?s)<[^>]*>"
# The minimal named-entity set every extractor must handle; numeric
# entities pass through untouched (they are already text-safe).
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def _strip_markup(col: Column) -> Column:
    """Tags → '', basic entities decoded, whitespace runs collapsed,
    ends trimmed. (&amp; is decoded LAST so '&amp;lt;' yields the
    literal '&lt;' — the standard double-escape rule.)"""
    txt = F.regexp_replace(col, _ANY_TAG, "")
    for ent, rep in _ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def html_blocks(col: Column) -> Column:
    """array<string> of raw HTML block fragments: comments and
    script/style/noscript/svg/textarea containers removed, then split
    at every block-level tag boundary. Fragments keep their INLINE
    markup (<a>, <em>, …) so per-block link density is still
    computable; empty fragments are dropped."""
    cleaned = F.regexp_replace(col, _COMMENT, "")
    for pat in _DROP_CONTENT:
        cleaned = F.regexp_replace(cleaned, pat, "")
    parts = F.split(cleaned, _BLOCK_BOUNDARY)
    return F.filter(parts, lambda b: F.trim(b) != "")


def block_features(col: Column) -> Column:
    """Per-block feature structs over :func:`html_blocks` output:
    ``array<struct<text, n_chars, n_words, link_chars, link_density,
    stop_ratio>>``. ``link_chars`` counts VISIBLE anchor text (anchor
    inner HTML, tags stripped); ``link_density`` = link_chars /
    max(1, n_chars); ``stop_ratio`` uses the repo's default English
    stopword probe (language-list-free callers can ignore it — the
    default classifier does not gate on it)."""
    from .text import DEFAULT_STOPWORDS

    def feats(b: Column) -> Column:
        text = _strip_markup(b)
        n_chars = F.length(text)
        toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
        n_words = F.size(toks)
        link_txt = F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR), 1),
            F.lit(""),
            lambda acc, a: F.concat(acc, _strip_markup(a)),
        )
        link_chars = F.length(link_txt)
        stops = F.size(F.filter(toks, lambda t: F.lower(t).isin(*DEFAULT_STOPWORDS)))
        return F.struct(
            text.alias("text"),
            n_chars.alias("n_chars"),
            n_words.alias("n_words"),
            link_chars.alias("link_chars"),
            F.round(link_chars / F.greatest(n_chars, F.lit(1)), 6).alias("link_density"),
            F.round(stops / F.greatest(n_words, F.lit(1)), 6).alias("stop_ratio"),
        )

    return F.transform(html_blocks(col), feats)


def main_text(
    col: Column,
    min_words: int = 5,
    max_link_density: float = 0.33,
    min_stop_ratio: float = 0.0,
) -> Column:
    """jusText-lite main-content text of an HTML document: blocks that
    are long enough (≥ ``min_words``), not link farms (link_density ≤
    ``max_link_density``), and — when ``min_stop_ratio`` > 0 — read
    like prose (stop_ratio ≥ threshold; OFF by default to stay
    language-neutral), rejoined with newlines in document order.
    Navigation menus, footers, button rows, and tag clouds are exactly
    the blocks this drops: short, link-dense, stopword-poor."""
    good = F.filter(
        block_features(col),
        lambda s: (s["n_words"] >= F.lit(min_words))
        & (s["link_density"] <= F.lit(max_link_density))
        & (s["stop_ratio"] >= F.lit(min_stop_ratio)),
    )
    return F.array_join(F.transform(good, lambda s: s["text"]), "\n")


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    min_words: int = 5,
    max_link_density: float = 0.33,
    min_stop_ratio: float = 0.0,
) -> DataFrame:
    """DataFrame form of :func:`main_text` plus per-page diagnostics
    the curation dashboards want: ``n_blocks`` / ``n_good_blocks``
    (pages where n_good_blocks == 0 are chrome-only and should be
    dropped by the caller's page gate, the c4_page_flags posture).

    Plan note: Catalyst collapses the three projections into one and
    inlines the block-feature tree into each output column (no CSE for
    interpreted higher-order lambdas), so this form regex-scans each
    page ~3×; :func:`main_text` alone scans once. Still zero-shuffle,
    row-parallel, and cheap relative to the parquet I/O — pages are KB
    and the regex pass is linear."""
    feats = block_features(F.col(html_col))
    good = F.filter(
        feats,
        lambda s: (s["n_words"] >= F.lit(min_words))
        & (s["link_density"] <= F.lit(max_link_density))
        & (s["stop_ratio"] >= F.lit(min_stop_ratio)),
    )
    return (
        df.withColumn("n_blocks", F.size(feats))
        .withColumn("n_good_blocks", F.size(good))
        .withColumn(out_col, F.array_join(F.transform(good, lambda s: s["text"]), "\n"))
    )
