"""URL/domain curation ops: host/domain extraction, feature struct,
broadcast blocklist anti-join, domain mixture shares."""

from __future__ import annotations

from pyspark.sql import functions as F

from electrician_spark.functions import url as u


def _hosts(spark, urls):
    df = spark.createDataFrame([(x,) for x in urls], ["url"])
    return [r["h"] for r in df.select(u.url_host(F.col("url")).alias("h")).collect()]


def test_url_host_parses_and_lowercases(spark):
    got = _hosts(
        spark,
        [
            "https://News.BBC.co.uk/stories/1",
            "http://example.com:8080/a?b=1",
            "example.com/bare-no-scheme",
            "ftp://files.example.org/x",
        ],
    )
    assert got == ["news.bbc.co.uk", "example.com", "example.com", "files.example.org"]


def test_registered_domain_heuristic(spark):
    cases = {
        "news.bbc.co.uk": "bbc.co.uk",
        "a.b.example.com": "example.com",
        "example.com": "example.com",
        "localhost": "localhost",
        "10.1.2.3": "10.1.2.3",
        "shop.com.au": "shop.com.au",
        "www.shop.com.au": "shop.com.au",
    }
    df = spark.createDataFrame([(h,) for h in cases], ["host"])
    got = {
        r["host"]: r["d"]
        for r in df.select("host", u.registered_domain(F.col("host")).alias("d")).collect()
    }
    assert got == cases


def test_url_features_struct(spark):
    df = spark.createDataFrame(
        [("https://www.example.com/a/b/c?q=1",), ("http://x1y2z3a4b5.deep.sub.host.spam.tld/",)],
        ["url"],
    )
    rows = df.select(u.url_features(F.col("url")).alias("f")).collect()
    f0, f1 = rows[0]["f"], rows[1]["f"]
    assert f0["host"] == "www.example.com" and f0["domain"] == "example.com"
    assert f0["path_depth"] == 3 and f0["has_query"] is True
    assert f0["looks_spammy"] is False
    assert f1["looks_spammy"] is True  # 5 digits in host AND 5 labels


def test_blocklist_filter_is_broadcast_anti_join(spark):
    df = spark.createDataFrame(
        [
            (1, "https://good.example.com/x"),
            (2, "https://spam.badsite.com/y"),
            (3, "https://sub.badsite.com/z"),
            (4, "https://ok.org/w"),
        ],
        ["id", "url"],
    )
    out = u.filter_blocklisted_domains(df, ["BadSite.com"], url_col="url")
    assert sorted(r["id"] for r in out.collect()) == [1, 4]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_blocklist_filter_with_precomputed_domain_col(spark):
    df = spark.createDataFrame(
        [(1, "keep.org"), (2, "drop.net")], ["id", "dom"]
    )
    out = u.filter_blocklisted_domains(
        df, ["drop.net"], url_col="unused", domain_col="dom"
    )
    assert [r["id"] for r in out.collect()] == [1]
    assert out.columns == ["id", "dom"]


def test_domain_mixture_shares(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/1",),
            ("https://a.com/2",),
            ("https://www.a.com/3",),
            ("https://b.org/1",),
        ],
        ["url"],
    )
    rows = {r["domain"]: r for r in u.domain_mixture(df).collect()}
    assert rows["a.com"]["docs"] == 3 and rows["b.org"]["docs"] == 1
    assert abs(rows["a.com"]["share"] - 0.75) < 1e-12
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-12


def test_canonical_url_click_invariance(spark):
    # two fetches of the same resource — different scheme, www, case,
    # default port, tracking params, param order, fragment, trailing
    # slash — must produce ONE canonical key.
    variants = [
        "https://www.Example.com:443/a/b/?b=2&utm_source=x&a=1#frag",
        "http://example.com/a/b?a=1&b=2",
        "example.com:80/a/b/?utm_campaign=y&b=2&a=1&gclid=zzz",
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(variants)], "i long, url string")
    keys = {r.k for r in df.select(u.canonical_url(F.col("url")).alias("k")).collect()}
    assert keys == {"example.com/a/b?a=1&b=2"}


def test_canonical_url_edges(spark):
    cases = {
        "https://site.org": "site.org/",          # bare host -> root path
        "https://site.org/": "site.org/",
        "http://a.net/p?utm_source=x": "a.net/p",  # all params tracking -> no '?'
        "http://b.io/p?ref=hn&z=1&y=2": "b.io/p?y=2&z=1",
        "not a url at all ://": None,              # unparseable -> NULL
    }
    df = spark.createDataFrame([(k,) for k in cases], "url string")
    got = {r.url: r.k for r in df.select("url", u.canonical_url(F.col("url")).alias("k")).collect()}
    assert got == cases
