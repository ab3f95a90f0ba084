"""URL / domain curation functions for web-corpus pipelines.

Everything here is a built-in Column expression (``parse_url``,
split/slice/regexp — JVM-side, whole-stage codegen); the blocklist
filter is a broadcast anti-join. At 100 TB: one scan, no Python, and
the blocklist (thousands to low millions of domains) broadcasts —
never a shuffle of the corpus on the domain key.

Registered-domain extraction uses a *documented heuristic*: the last
two labels, or the last three when the last two form a known
multi-part public suffix (co.uk, com.au, …). A full Public Suffix List
lookup is a drop-in replacement — ship the PSL as a broadcast map and
swap `_registrable` — but the PSL file is not vendored here to keep
the engine dependency-free.

Reference parity: the reference engine carries no URL ops (transport
adapters only); this module is part of the mandated LLM-pipeline
extension surface (CommonCrawl-style curation: domain mixing, host
dedup keys, blocklist removal).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, functions as F

# Multi-part public suffixes common enough that the 2-label heuristic
# would otherwise mis-root a large corpus share. Heuristic, documented;
# see module docstring for the full-PSL upgrade path.
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "com.sg", "com.hk", "com.tw",
)


def url_host(url: Column) -> Column:
    """Lowercased hostname (port stripped). NULL for unparseable URLs —
    schemeless inputs are retried with an ``http://`` prefix first, so
    bare ``example.com/path`` rows still resolve."""
    host = F.coalesce(
        F.parse_url(url, F.lit("HOST")),
        F.parse_url(F.concat(F.lit("http://"), url), F.lit("HOST")),
    )
    host = F.lower(F.split(host, ":", 2)[0])
    return F.when(host == "", None).otherwise(host)


def registered_domain(host: Column) -> Column:
    """Registrable domain of a hostname (heuristic — see module
    docstring): ``news.bbc.co.uk`` → ``bbc.co.uk``, ``a.b.example.com``
    → ``example.com``. IPv4 literals pass through unchanged (an IP has
    no registrable domain; keeping it intact keeps it groupable)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    is_multipart = last2.isin(*MULTIPART_SUFFIXES)
    return (
        F.when(host.isNull(), None)
        .when(is_ip, host)
        .when(n <= 2, host)
        .when(is_multipart, last3)
        .otherwise(last2)
    )


def url_features(url: Column) -> Column:
    """Struct of curation-relevant URL signals, one codegen'd pass:
    host, registrable domain, path, path depth, query presence, and a
    ``looks_spammy`` heuristic (digit-heavy or very deep hosts — the
    cheap pre-filter before model-based URL scoring)."""
    host = url_host(url)
    path = F.coalesce(
        F.parse_url(url, F.lit("PATH")),
        F.parse_url(F.concat(F.lit("http://"), url), F.lit("PATH")),
        F.lit(""),
    )
    depth = F.size(F.filter(F.split(path, "/"), lambda p: p != ""))
    host_digits = F.length(F.regexp_replace(host, r"[^0-9]", ""))
    host_labels = F.size(F.split(host, r"\."))
    looks_spammy = (host_digits >= 5) | (host_labels >= 5)
    return F.struct(
        host.alias("host"),
        registered_domain(host).alias("domain"),
        path.alias("path"),
        depth.alias("path_depth"),
        F.parse_url(url, F.lit("QUERY")).isNotNull().alias("has_query"),
        F.coalesce(looks_spammy, F.lit(False)).alias("looks_spammy"),
    )


def filter_blocklisted_domains(
    df: DataFrame,
    blocklist: DataFrame | Iterable[str],
    url_col: str = "url",
    domain_col: str | None = None,
) -> DataFrame:
    """Drop rows whose registrable domain appears in ``blocklist``.

    ``blocklist`` is a one-column DataFrame (``domain``) or an iterable
    of domain strings. The join is a **broadcast LEFT ANTI** on the
    derived domain — the corpus never shuffles; each task probes a
    broadcast hash set. Pass ``domain_col`` to reuse an
    already-materialized domain column instead of re-deriving it."""
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = spark.createDataFrame(
            [(d.lower(),) for d in blocklist], "domain string"
        )
    bl = blocklist.select(F.lower(F.col(blocklist.columns[0])).alias("__bl_domain")).distinct()
    if domain_col is None:
        probe = df.withColumn("__probe_domain", registered_domain(url_host(F.col(url_col))))
    else:
        probe = df.withColumn("__probe_domain", F.lower(F.col(domain_col)))
    out = probe.join(
        F.broadcast(bl),
        probe["__probe_domain"] == bl["__bl_domain"],
        "left_anti",
    )
    return out.drop("__probe_domain")


def domain_mixture(
    df: DataFrame, url_col: str = "url", domain_col: str | None = None
) -> DataFrame:
    """(domain, docs, share) table — the input to mixture/temperature
    sampling (sampling.mixture_sample). One scan + one map-side-combined
    groupBy on the registrable domain."""
    if domain_col is None:
        keyed = df.select(registered_domain(url_host(F.col(url_col))).alias("domain"))
    else:
        keyed = df.select(F.lower(F.col(domain_col)).alias("domain"))
    counts = keyed.groupBy("domain").agg(F.count("*").alias("docs"))
    # share via a broadcast single-row bounds join (same pinned pattern
    # as quantize.py) — an unpartitioned window here would funnel every
    # domain row through ONE task at scale.
    total = counts.agg(F.sum("docs").alias("__total"))
    return counts.join(F.broadcast(total)).select(
        "domain", "docs", (F.col("docs") / F.col("__total")).alias("share")
    )
