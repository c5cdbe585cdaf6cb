"""robots.txt parser (sources/robots.py): group selection, directive subset,
end-to-end into the politeness gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.sources.robots import (
    parse_robots_bodies,
    py_parse_robots,
)

BODY_BASIC = """
# comment line
User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 2.5

User-agent: evilbot
Disallow: /
"""

BODY_MULTI_AGENT = """
User-agent: googlebot
User-agent: *
Disallow: /a
User-agent: other
Disallow: /b
"""

BODY_EMPTY_DISALLOW = """
User-agent: *
Disallow:
Crawl-delay: nonsense
"""


def test_py_parse_groups_and_directives():
    dis, delay = py_parse_robots(BODY_BASIC)
    assert dis == ["/private", "/tmp/"] and delay == 2.5
    # the evilbot group must not leak into the * view
    dis_evil, _ = py_parse_robots(BODY_BASIC, agent="evilbot")
    assert dis_evil == ["/private", "/tmp/", "/"]
    # consecutive User-agent lines share one group
    dis, _ = py_parse_robots(BODY_MULTI_AGENT)
    assert dis == ["/a"]
    dis, _ = py_parse_robots(BODY_MULTI_AGENT, agent="other")
    assert dis == ["/a", "/b"]
    # empty Disallow contributes nothing; bad Crawl-delay ignored
    dis, delay = py_parse_robots(BODY_EMPTY_DISALLOW)
    assert dis == [] and delay is None


def test_parse_bodies_feeds_politeness_gate(spark):
    from mcp_crawl4ai_rag_spark.operators.politeness import robots_denied_expr

    fetched = spark.createDataFrame(
        [("h1.x", BODY_BASIC), ("h2.x", BODY_EMPTY_DISALLOW), ("h3.x", None)],
        "host string, body string",
    )
    robots = parse_robots_bodies(fetched)
    rows = {r["host"]: r for r in robots.collect()}
    assert list(rows["h1.x"]["disallow_prefixes"]) == ["/private", "/tmp/"]
    assert rows["h1.x"]["crawl_delay"] == 2.5
    assert list(rows["h2.x"]["disallow_prefixes"]) == []
    assert list(rows["h3.x"]["disallow_prefixes"]) == []

    urls = spark.createDataFrame(
        [("h1.x", "/private/x"), ("h1.x", "/public"), ("h2.x", "/private/x")],
        "host string, path string",
    )
    gated = urls.join(F.broadcast(robots), "host", "left").withColumn(
        "denied", robots_denied_expr()
    )
    got = {(r["host"], r["path"]): r["denied"] for r in gated.collect()}
    assert got[("h1.x", "/private/x")] is True
    assert got[("h1.x", "/public")] is False
    assert got[("h2.x", "/private/x")] is False
