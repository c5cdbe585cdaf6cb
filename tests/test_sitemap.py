"""Sitemap source (S3) + smart-crawl dispatch differential tests.

Oracle: the corpus formulas (sources/corpus.py) — host h's sitemap tree
flattens to exactly {url(i) : host(i)=h}; the smart sitemap crawl fetches
the expandable subset of it."""

from __future__ import annotations

import pytest

from mcp_crawl4ai_rag_spark.plans.smart import smart_crawl
from mcp_crawl4ai_rag_spark.sources.corpus import (
    gen_pages,
    gen_robots,
    gen_sitemaps,
    host_of,
    status_of,
    url_of,
)
from mcp_crawl4ai_rag_spark.sources.sitemap import expand_sitemaps

N = 400


@pytest.fixture(scope="module")
def sitemaps(spark):
    return gen_sitemaps(spark, N, partitions=8).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def pages(spark):
    return gen_pages(spark, N, partitions=8).localCheckpoint(eager=True)


def test_expand_matches_formula(spark, sitemaps):
    got = {
        r["url"]
        for r in expand_sitemaps(
            spark, sitemaps, ["https://h3.example.com/sitemap_index.xml"]
        ).collect()
    }
    expected = {url_of(i) for i in range(N) if host_of(i) == 3}
    assert got == expected and got


def test_expand_depth_cap(spark, sitemaps):
    # depth cap 0: the index is fetched but its sub-sitemaps are not
    got = expand_sitemaps(
        spark, sitemaps, ["https://h3.example.com/sitemap_index.xml"], max_depth=0
    ).collect()
    assert got == []  # index contains only <sitemap> entries, no page urls


def test_expand_direct_urlset(spark, sitemaps):
    # seeding a leaf sitemap yields only its own partition of the host pages
    got = {
        r["url"]
        for r in expand_sitemaps(
            spark, sitemaps, ["https://h3.example.com/sitemap_1.xml.gz"]
        ).collect()
    }
    expected = {url_of(i) for i in range(N) if host_of(i) == 3 and i % 3 == 1}
    assert got == expected and got


def test_smart_crawl_sitemap_fetches_expandable_hostset(spark, pages, sitemaps):
    res = smart_crawl(
        spark,
        "https://h2.example.com/sitemap_index.xml",
        pages=pages,
        sitemaps=sitemaps,
        robots=gen_robots(spark),
    )
    got = {r["canonical_url"] for r in res.fetched.collect()}
    expected = {
        url_of(i)
        for i in range(N)
        if host_of(i) == 2 and status_of(i) == 200 and i % 41 != 0
    }
    assert got == expected and got
    # robots-denied and failed URLs were still consumed (url_seen ⊇ fetched)
    seen = {r["canonical_url"] for r in res.url_seen.collect()}
    assert seen == {url_of(i) for i in range(N) if host_of(i) == 2}


def test_smart_crawl_txt_single_fetch(spark, sitemaps):
    # a .txt corpus entry: single fetch, no link following
    from pyspark.sql import functions as F

    txt_pages = spark.createDataFrame(
        [
            (
                "https://h0.example.com/readme.txt",
                "h0.example.com",
                "/readme.txt",
                "plain text body",
                ["https://h0.example.com/p/1"],  # must NOT be followed
                [],
                200,
                True,
            )
        ],
        "url string, host string, path string, markdown string, "
        "out_links array<string>, image_ids array<string>, status int, success boolean",
    )
    res = smart_crawl(
        spark, "https://h0.example.com/readme.txt", pages=txt_pages, sitemaps=sitemaps
    )
    assert [r["canonical_url"] for r in res.fetched.collect()] == [
        "https://h0.example.com/readme.txt"
    ]
    assert res.url_seen.count() == 1  # the linked page was never scheduled


def test_lastmod_parse_and_age_priority(spark):
    """<lastmod> entries parse out of (gzipped) sitemap bodies; the age
    kernel converts them to an ascending freshness priority with clamps
    and an explicit missing-default; a URL listed twice keeps its newest
    lastmod."""
    import gzip as _gzip

    from mcp_crawl4ai_rag_spark.sources.sitemap import (
        expand_sitemaps,
        lastmod_age_priority,
        parse_sitemap_bodies,
    )

    xml_a = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://s.example.com/fresh</loc>"
        "<lastmod>2026-02-27</lastmod></url>"
        "<url><loc>https://s.example.com/stale</loc>"
        "<lastmod>2016-01-01</lastmod></url>"
        "<url><loc>https://s.example.com/dup</loc>"
        "<lastmod>2026-01-05</lastmod></url>"
        "<url><loc>https://s.example.com/nolm</loc></url>"
        "</urlset>"
    )
    xml_b = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://s.example.com/dup</loc>"
        "<lastmod>2026-02-01</lastmod></url>"
        "</urlset>"
    )
    corpus = spark.createDataFrame(
        [
            ("https://s.example.com/a.xml", bytearray(xml_a.encode())),
            ("https://s.example.com/b.xml.gz", bytearray(_gzip.compress(xml_b.encode()))),
        ],
        "url string, body binary",
    )
    ent = parse_sitemap_bodies(corpus).collect()
    lm = {r["loc"]: r["lastmod"] for r in ent}
    assert lm["https://s.example.com/fresh"] == "2026-02-27"
    assert lm["https://s.example.com/nolm"] is None

    out = expand_sitemaps(
        spark, corpus,
        ["https://s.example.com/a.xml", "https://s.example.com/b.xml.gz"],
        with_lastmod=True,
    )
    got = {
        r["url"]: r["prio"]
        for r in out.select(
            "url", lastmod_age_priority("lastmod", "2026-03-01").alias("prio")
        ).collect()
    }
    assert got["https://s.example.com/fresh"] == 2      # 2 days old
    assert got["https://s.example.com/stale"] == 3650   # clamped
    assert got["https://s.example.com/dup"] == 28       # newest of the two
    assert got["https://s.example.com/nolm"] == 365     # missing default
    # fresher page sorts ahead under ascending priority
    assert got["https://s.example.com/fresh"] < got["https://s.example.com/dup"]


def test_priority_parse_and_milli(spark):
    """<priority> parses alongside lastmod; the milli kernel inverts,
    clamps, and defaults per the sitemaps.org contract."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.sources.sitemap import (
        parse_sitemap_bodies,
        sitemap_priority_milli,
    )

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://e.com/a</loc><priority>0.8</priority></url>"
        "<url><loc>https://e.com/b</loc><priority>1.0</priority></url>"
        "<url><loc>https://e.com/c</loc></url>"
        "<url><loc>https://e.com/d</loc><priority>junk</priority></url>"
        "<url><loc>https://e.com/e</loc><priority>7.5</priority></url>"
        "<url><loc>https://e.com/f</loc><priority>-1</priority></url>"
        "</urlset>"
    ).encode()
    df = spark.createDataFrame(
        [("https://e.com/sitemap.xml", xml)], "url string, body binary"
    )
    rows = {
        r["loc"]: r["val"]
        for r in parse_sitemap_bodies(df)
        .select("loc", sitemap_priority_milli("priority").alias("val"))
        .collect()
    }
    assert rows == {
        "https://e.com/a": 200,   # 1000 - 800
        "https://e.com/b": 0,     # top priority pops first
        "https://e.com/c": 500,   # missing -> spec default 0.5
        "https://e.com/d": 500,   # unparseable -> default
        "https://e.com/e": 0,     # clamps to 1.0
        "https://e.com/f": 1000,  # clamps to 0.0
    }


def test_priority_expansion_dup_max_and_ordering(spark):
    """Duplicate URLs keep the NUMERIC max priority; corpus expansion with
    with_priority yields the closed-form i%11 ladder, and the milli order
    puts owner-prioritized pages first."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.sources.corpus import gen_sitemaps, host_of
    from mcp_crawl4ai_rag_spark.sources.sitemap import (
        expand_sitemaps,
        parse_sitemap_bodies,
        sitemap_priority_milli,
    )

    # dup resolution: numeric max ('.9'-style strings would break a string max)
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://e.com/a</loc><priority>0.5</priority></url>"
        "<url><loc>https://e.com/a</loc><priority>.9</priority></url>"
        "</urlset>"
    ).encode()
    dup = spark.createDataFrame(
        [("https://e.com/s.xml", xml)], "url string, body binary"
    )
    got = expand_sitemaps(
        spark, dup, ["https://e.com/s.xml"], with_priority=True
    ).collect()
    assert len(got) == 1 and abs(got[0]["priority"] - 0.9) < 1e-9

    n = 200
    ex = expand_sitemaps(
        spark,
        gen_sitemaps(spark, n),
        ["https://h1.example.com/sitemap_index.xml"],
        with_priority=True,
    ).select(
        "url", sitemap_priority_milli("priority").alias("val")
    )
    rows = {r["url"]: r["val"] for r in ex.collect()}
    from mcp_crawl4ai_rag_spark.sources.corpus import url_of

    expect = {
        url_of(i): (0 if i % 11 == 10 else 1000 - 100 * (i % 11))
        for i in range(n)
        if host_of(i) == 1
    }
    assert rows == expect


def test_changefreq_parse_map_and_dup_min(spark):
    """<changefreq> parses case-insensitively, maps to recrawl-interval
    hours with junk/missing defaulting to monthly, and duplicate URLs keep
    the MOST FREQUENT claim (min interval)."""
    from mcp_crawl4ai_rag_spark.sources.sitemap import (
        expand_sitemaps,
        py_changefreq_interval_hours,
    )

    assert py_changefreq_interval_hours("always") == 0
    assert py_changefreq_interval_hours("HOURLY") == 1
    assert py_changefreq_interval_hours("daily") == 24
    assert py_changefreq_interval_hours("never") == 87600
    assert py_changefreq_interval_hours("junk") == 720
    assert py_changefreq_interval_hours(None) == 720

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://e.com/a</loc><changefreq>yearly</changefreq></url>"
        "<url><loc>https://e.com/a</loc><changefreq>Daily</changefreq></url>"
        "<url><loc>https://e.com/b</loc></url>"
        "<url><loc>https://e.com/c</loc><changefreq>bogus</changefreq></url>"
        "</urlset>"
    ).encode()
    df = spark.createDataFrame(
        [("https://e.com/s.xml", xml)], "url string, body binary"
    )
    rows = {
        r["url"]: r["changefreq_hours"]
        for r in expand_sitemaps(
            spark, df, ["https://e.com/s.xml"], with_changefreq=True
        ).collect()
    }
    assert rows == {
        "https://e.com/a": 24,   # daily beats yearly (min interval)
        "https://e.com/b": 720,  # missing -> monthly default
        "https://e.com/c": 720,  # junk -> monthly default
    }


def test_changefreq_explicit_claim_beats_absent_tag(spark):
    """A URL duplicated with one explicit 'yearly' entry and one tag-less
    entry keeps the explicit claim: the default competes AFTER the min,
    never inside it (ADVICE r4 — the in-min default silently demoted
    yearly/never to monthly)."""
    from mcp_crawl4ai_rag_spark.sources.sitemap import expand_sitemaps

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://e.com/a</loc><changefreq>yearly</changefreq></url>"
        "<url><loc>https://e.com/a</loc></url>"
        "<url><loc>https://e.com/n</loc><changefreq>never</changefreq></url>"
        "<url><loc>https://e.com/n</loc><changefreq>bogus</changefreq></url>"
        "</urlset>"
    ).encode()
    df = spark.createDataFrame(
        [("https://e.com/s.xml", xml)], "url string, body binary"
    )
    rows = {
        r["url"]: r["changefreq_hours"]
        for r in expand_sitemaps(
            spark, df, ["https://e.com/s.xml"], with_changefreq=True
        ).collect()
    }
    assert rows == {
        "https://e.com/a": 8760,   # explicit yearly survives the dup
        "https://e.com/n": 87600,  # explicit never survives junk twin
    }


def test_changefreq_corpus_cycle(spark):
    """Corpus expansion yields the closed-form i%7 vocabulary cycle."""
    from mcp_crawl4ai_rag_spark.sources.corpus import (
        CHANGEFREQ_VALUES,
        gen_sitemaps,
        host_of,
        url_of,
    )
    from mcp_crawl4ai_rag_spark.sources.sitemap import (
        CHANGEFREQ_HOURS,
        expand_sitemaps,
    )

    n = 200
    got = {
        r["url"]: r["changefreq_hours"]
        for r in expand_sitemaps(
            spark,
            gen_sitemaps(spark, n),
            ["https://h1.example.com/sitemap_index.xml"],
            with_changefreq=True,
        ).collect()
    }
    want = {
        url_of(i): CHANGEFREQ_HOURS[CHANGEFREQ_VALUES[i % 7]]
        for i in range(n)
        if host_of(i) == 1
    }
    assert got == want
