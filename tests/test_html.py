"""HTML boilerplate removal (functions/html.py): block segmentation,
per-block features (link density, stopword ratio), jusText-lite
classification, and equality against a plain-Python reference over a
crafted page zoo — plus the RE2-portability invariant (no
backreferences / lookarounds in any pattern)."""

import re

import pytest
from pyspark.sql import functions as F

from electrician_spark.functions import html as H

PAGE = """
<!DOCTYPE html>
<html><head><title>My Site</title>
<style>body { color: red; }</style>
<script>var nav = "menu"; if (1 < 2) { load(); }</script>
</head><body>
<!-- header chrome -->
<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li>
<li><a href="/contact">Contact</a></li></ul></nav>
<h1>The Article Title Words Here</h1>
<p>The quick brown fox jumps over the lazy dog and keeps on running to
the distant hills of the north.</p>
<div>Short bit</div>
<p>Another paragraph of the story continues here with plenty of real
words and the kind of prose density a content block is expected to
have, see &amp; read &lt;more&gt;.</p>
<p>Read more at <a href="/x">the article page everyone likes</a> plus
trailing words to dilute the anchor body far enough below threshold.</p>
<footer><a href="/tos">Terms</a> | <a href="/priv">Privacy</a> |
<a href="/imprint">Imprint</a></footer>
</body></html>
"""

_BOUNDARY = re.compile(H._BLOCK_BOUNDARY.replace("(?i)", ""), re.I)
_TAG = re.compile(r"<[^>]*>", re.S)
_ANCHOR_RE = re.compile(r"<a(?:\s[^>]*)?>(.*?)</a>", re.I | re.S)


def _ref_strip(s: str) -> str:
    s = _TAG.sub("", s)
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        s = s.replace(ent, rep)
    return re.sub(r"\s+", " ", s).strip()


def _ref_blocks(page: str) -> list[str]:
    page = re.sub(r"<!--.*?-->", "", page, flags=re.S)
    for t in ("script", "style", "noscript", "svg", "textarea"):
        page = re.sub(rf"<{t}(?:\s[^>]*)?>.*?</{t}>", "", page, flags=re.I | re.S)
    return [b for b in _BOUNDARY.split(page) if b.strip()]


def _ref_main(page: str, min_words=5, max_ld=0.33) -> str:
    out = []
    for b in _ref_blocks(page):
        text = _ref_strip(b)
        words = [w for w in text.split() if w]
        link = "".join(_ref_strip(m) for m in _ANCHOR_RE.findall(b))
        ld = len(link) / max(1, len(text))
        if len(words) >= min_words and ld <= max_ld:
            out.append(text)
    return "\n".join(out)


def test_main_text_keeps_prose_drops_chrome(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    got = df.select(H.main_text(F.col("html")).alias("t")).collect()[0].t
    assert "quick brown fox" in got
    assert "Another paragraph of the story" in got
    assert "read <more>" in got  # entities decoded, double-escape safe
    # chrome is gone: nav menu, footer links, scripts, styles, title
    for bad in ("Home", "Terms", "Privacy", "color: red", "var nav", "My Site"):
        assert bad not in got
    assert "Short bit" not in got  # below min_words
    # anchor-diluted paragraph survives (link density under threshold)
    assert "trailing words to dilute" in got


def test_reference_equality_page_zoo(spark):
    pages = [
        (1, PAGE),
        (2, "<p>no markup at all just eleven plain words of text here</p>"),
        (3, "<div><a href='/'>all link</a></div>"),  # pure link farm
        (4, ""),  # empty page
        (5, "<p>self-closing<br/>split keeps the both halves when long "
            "enough to pass the gate</p>"),
        (6, "<P CLASS='x'>UPPERCASE tags and the attributes still split "
            "the blocks correctly here</P>"),
        (7, "<article>unclosed tags still yield the one block of "
            "perfectly usable text</article"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = {
        r.doc_id: r.t
        for r in df.select("doc_id", H.main_text(F.col("html")).alias("t")).collect()
    }
    for did, page in pages:
        assert got[did] == _ref_main(page), did


def test_block_features_link_density(spark):
    page = "<p>four words <a href='/x'>linked text</a> here</p>"
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    (r,) = df.select(F.explode(H.block_features(F.col("html"))).alias("b")).collect()
    b = r.b
    assert b.text == "four words linked text here"
    assert b.link_chars == len("linked text")
    assert b.link_density == round(len("linked text") / len(b.text), 6)
    assert b.n_words == 5
    # stopword probe: no DEFAULT_STOPWORDS tokens in this block
    assert b.stop_ratio == 0.0


def test_extract_main_text_diagnostics(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, "<nav><a href='/'>Home</a></nav>")],
        "doc_id long, html string",
    )
    out = {r.doc_id: r for r in H.extract_main_text(df).collect()}
    assert out[1].n_good_blocks >= 4 and out[1].n_blocks > out[1].n_good_blocks
    assert out[2].n_good_blocks == 0 and out[2].text == ""  # chrome-only page


def test_min_stop_ratio_gate(spark):
    page = ("<p>alpha beta gamma delta epsilon zeta eta theta</p>"
            "<p>the cat sat on a mat and it is the best of mats</p>")
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    got = df.select(
        H.main_text(F.col("html"), min_stop_ratio=0.2).alias("t")
    ).collect()[0].t
    assert "the cat sat" in got and "alpha beta" not in got


def test_patterns_are_re2_portable():
    """No backreferences or lookarounds anywhere — the DuckDB-replay
    precondition every oracle-able regex stage in this repo keeps."""
    pats = [H._BLOCK_BOUNDARY, H._COMMENT, H._ANCHOR, H._ANY_TAG, *H._DROP_CONTENT]
    for p in pats:
        assert not re.search(r"\\[1-9]|\(\?<?[=!]", p), p
