"""robots.txt parsing and URL gating (RFC 9309, the Robots Exclusion
Protocol) — the crawl-compliance stage between URL frontier and fetch
in any crawl-derived training-data pipeline: which of these 10¹⁰
frontier URLs may this crawler fetch, per the robots.txt each host
published.

Reference parity: the reference engine ingests from HTTP but has no
crawl-policy stage (its pollers hit fixed endpoints); this belongs to
the crawl-curation battery beside the WARC source and URL operators.

Two stages:

- :func:`parse_robots` — robots.txt bodies → one rules row per
  (host, agent-group, allow/disallow, path pattern) plus per-group
  crawl-delay and per-host sitemap rows. Group-membership is
  sequential (consecutive ``User-agent`` lines open a shared group;
  rules bind to the open group) — per-file sequential logic in an
  Arrow-batched pandas kernel (the bpe_encode contract: robots files
  are small, one kernel call parses a whole file).
- :func:`robots_allowed` — gate a URL table against the rules table
  with RFC 9309 semantics: the matching group is the requested
  agent's own group if the host defines one, else the ``*`` group;
  among matching rules the LONGEST pattern wins, allow wins ties;
  no matching rule (or no robots.txt at all) → allowed. ``*``
  wildcards and ``$`` end-anchors are compiled to RE2-safe regexes
  AT PARSE TIME (one regexp_replace chain, codegen), so the gate
  itself is join + RLIKE + one max_by aggregate — no Python.

100 TB posture: the rules table is bounded by the HOST count (a few
rules per host — ~10⁶–10⁸ rows for a full web crawl), joined on host
against the URL table: an equi-join Spark plans as broadcast when the
crawl is scoped, shuffle-hash at full web scale, with AQE handling the
hub-host skew. Matching rules per URL = the host's few rules — the
RLIKE filter and max_by run on that small multiplied set, map-side.
No global state, no driver collection.

Determinism: pure string/aggregate logic; ``max_by`` tiebreak is made
total by ordering on (match length, allow-bit, pattern) so equal-length
duplicate patterns cannot flap between runs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_RULE = StructType(
    [
        StructField("agent", StringType()),
        StructField("rule", StringType()),  # 'allow' | 'disallow'
        StructField("pattern", StringType()),
    ]
)

_PARSED = StructType(
    [
        StructField("rules", ArrayType(_RULE)),
        StructField("crawl_delays", ArrayType(
            StructType([
                StructField("agent", StringType()),
                StructField("delay", DoubleType()),
            ])
        )),
        StructField("sitemaps", ArrayType(StringType())),
    ]
)


def _parse_one(body: str):
    """One robots.txt → (rules, crawl_delays, sitemaps). Implements
    RFC 9309 §2.2 group semantics: consecutive User-agent lines open
    one shared group; Allow/Disallow/Crawl-delay bind to the open
    group; a User-agent line after rules starts a NEW group. Empty
    Disallow ("Disallow:") means allow-everything — dropped (no rule).
    Lines are split on '#' comments; keys are case-insensitive;
    unknown keys are ignored per spec."""
    rules, delays, sitemaps = [], [], []
    agents: list[str] = []
    group_open = False  # collecting consecutive User-agent lines
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            group_open = False
            if not agents:
                continue  # rule before any group: ignored per spec
            if val == "":
                continue  # empty pattern = no rule
            for a in agents:
                rules.append((a, key, val))
        elif key == "crawl-delay":
            group_open = False
            try:
                d = float(val)
            except ValueError:
                continue
            for a in agents:
                delays.append((a, d))
        elif key == "sitemap":
            # sitemap is group-independent per spec
            if val:
                sitemaps.append(val)
        else:
            group_open = False
    return rules, delays, sitemaps


def _pattern_rx(pattern):
    """Compile a robots path pattern Column to an anchored RE2 regex
    Column: regex metachars escaped, ``*`` → ``.*``, trailing ``$`` →
    end anchor. Codegen regexp_replace chain — runs once per RULE at
    parse time, never per URL."""
    # escape everything RE2-special except * and $ (handled below)
    rx = F.regexp_replace(pattern, r"([.\^+?(){}\[\]|\\])", r"\\$1")
    rx = F.regexp_replace(rx, r"\*", ".*")
    # a $ that survives at end = anchor; inner $ are literal
    rx = F.regexp_replace(rx, r"\$$", "\x00END\x00")
    rx = F.regexp_replace(rx, r"\$", r"\\\$")
    rx = F.regexp_replace(rx, "\x00END\x00", r"\$")
    return F.concat(F.lit("^"), rx)


def parse_robots(
    robots_df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """robots.txt bodies → rules table: one row per (host, agent,
    rule, pattern, rx) plus exploded ``crawl_delay`` and ``sitemap``
    side-outputs accessible via :func:`robots_crawl_delays` /
    :func:`robots_sitemaps` on the same parsed frame. ``rx`` is the
    precompiled anchored regex for :func:`robots_allowed`."""

    @F.pandas_udf(_PARSED)
    def _parse(bodies: pd.Series) -> pd.DataFrame:
        rs, ds, sms = [], [], []
        for body in bodies:
            r, d, s = _parse_one(body or "")
            rs.append(r)
            ds.append(d)
            sms.append(s)
        return pd.DataFrame({"rules": rs, "crawl_delays": ds, "sitemaps": sms})

    return robots_df.select(
        F.col(host_col).alias("host"), _parse(F.col(body_col)).alias("_p")
    ).localCheckpoint()


def robots_rules(parsed: DataFrame) -> DataFrame:
    """(host, agent, rule, pattern, rx) — one row per rule."""
    r = parsed.select("host", F.explode("_p.rules").alias("r")).select(
        "host", "r.agent", "r.rule", "r.pattern"
    )
    return r.withColumn("rx", _pattern_rx(F.col("pattern")))


def robots_crawl_delays(parsed: DataFrame) -> DataFrame:
    return parsed.select("host", F.explode("_p.crawl_delays").alias("d")).select(
        "host", "d.agent", "d.delay"
    )


def robots_sitemaps(parsed: DataFrame) -> DataFrame:
    return parsed.select("host", F.explode("_p.sitemaps").alias("sitemap"))


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Gate URLs against a :func:`robots_rules` table for ``agent``.

    RFC 9309 evaluation, zero shuffle of the URL corpus:

    1. group selection — keep the host's rows for the requested agent
       if any exist, else its ``*`` rows (one max over a 2-valued
       rank; rules-table-sized work, broadcast joins);
    2. the selected rules collapse to ONE array-of-structs row per
       host (bounded: a robots.txt is ≤500 KB by RFC 9309 §2.5) and
       broadcast-join onto the URLs — the corpus never exchanges;
    3. verdict — per URL row, an array filter of the precompiled
       pattern regexes against path+query and a struct-ordered
       descending sort: longest match wins, allow wins ties
       (the (length, allow-bit, pattern) total order); unmatched or
       rule-less URLs are allowed. Row-local JVM HOFs, no Python,
       no groupBy — the gate rides the URL scan.

    Adds ``allowed`` (boolean) and ``matched_pattern`` (NULL when no
    rule matched)."""
    from electrician_spark.functions.url import url_host

    agent = agent.lower()
    cand = rules.filter(F.col("agent").isin(agent, "*")).withColumn(
        "_arank", F.when(F.col("agent") == agent, 2).otherwise(1)
    )
    best_rank = cand.groupBy("host").agg(F.max("_arank").alias("_amax"))
    grp = cand.join(F.broadcast(best_rank), "host").filter(
        F.col("_arank") == F.col("_amax")
    ).select("host", "rule", "pattern", "rx")
    host_rules = grp.filter(F.col("rx").isNotNull()).groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.length("pattern").alias("l"),
                (F.col("rule") == "allow").cast("int").alias("a"),
                F.col("pattern").alias("p"),
                F.col("rule").alias("rule"),
                F.col("rx").alias("rx"),
            )
        ).alias("_rules")
    )

    uc = F.col(url_col)
    path = F.coalesce(
        F.try_parse_url(uc, F.lit("PATH")),
        F.try_parse_url(F.concat(F.lit("http://"), uc), F.lit("PATH")),
    )
    # RFC 9309 §2.2.2 (and Google's reference matcher) match rules
    # against path-plus-query, not the path alone — otherwise
    # 'Disallow: /*?sessionid=' or '/search?q=' can never fire.
    qry = F.coalesce(
        F.try_parse_url(uc, F.lit("QUERY")),
        F.try_parse_url(F.concat(F.lit("http://"), uc), F.lit("QUERY")),
    )
    base = F.coalesce(F.nullif(path, F.lit("")), F.lit("/"))
    target = F.when(
        qry.isNotNull() & (qry != ""), F.concat(base, F.lit("?"), qry)
    ).otherwise(base)
    u = urls.withColumn("_host", F.lower(url_host(uc))).withColumn(
        "_path", target
    )
    j = u.join(
        F.broadcast(host_rules), u["_host"] == host_rules["host"], "left"
    )
    # row-local verdict: matching rules → descending struct sort →
    # head. F.get is NULL-safe on the empty/NULL array (unlike
    # element_at under ANSI), so unmatched and rule-less hosts fall
    # through to allowed=true with a NULL pattern.
    path = F.col("_path")
    matches = F.filter(F.col("_rules"), lambda r: F.regexp_like(path, r["rx"]))
    best = F.get(F.sort_array(matches, False), 0)
    return j.select(
        *[u[c] for c in urls.columns],
        best["p"].alias("matched_pattern"),
        F.coalesce(best["rule"] != "disallow", F.lit(True)).alias("allowed"),
    )


def _xml_unescape(c):
    """The five predefined XML entities — the only escaping the
    sitemap protocol requires for loc URLs."""
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&apos;", "'"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def parse_sitemaps(
    sitemap_df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """XML sitemap / sitemap-index bodies → one row per entry:
    (host, kind, loc, lastmod) where ``kind`` is ``url`` (urlset
    entry — a frontier URL) or ``sitemap`` (index entry — another
    sitemap to fetch). ``lastmod`` is the raw W3C datetime string or
    NULL. The crawl-frontier seed stage that pairs with
    :func:`robots_sitemaps` (which yields the sitemap URLs to fetch).

    Pure codegen: one ``regexp_extract_all`` per block kind ((?s)
    non-greedy block match — Java-regex and RE2 compatible), one
    explode, per-block regexp_extract for loc/lastmod, predefined XML
    entities unescaped. Per-row work is linear in sitemap size (the
    protocol caps one sitemap at 50 MB/50k URLs — bounded rows). CDATA
    sections are out of scope (vanishingly rare in real sitemaps;
    route exotic feeds through a pandas-UDF XML parser if needed)."""
    body = F.col(body_col)
    out = []
    for kind, tag in (("url", "url"), ("sitemap", "sitemap")):
        blocks = F.regexp_extract_all(
            body, F.lit(rf"(?s)<{tag}>(.*?)</{tag}>"), F.lit(1)
        )
        exploded = sitemap_df.select(
            F.col(host_col).alias("host"), F.explode(blocks).alias("blk")
        )
        loc = F.regexp_extract(F.col("blk"), r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
        lastmod = F.regexp_extract(
            F.col("blk"), r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1
        )
        out.append(
            exploded.select(
                "host",
                F.lit(kind).alias("kind"),
                _xml_unescape(loc).alias("loc"),
                F.nullif(lastmod, F.lit("")).alias("lastmod"),
            ).filter(F.col("loc") != "")
        )
    return out[0].unionAll(out[1])
