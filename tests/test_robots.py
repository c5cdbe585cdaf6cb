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


def test_crawl_delay_specific_agent_overrides_star():
    """RFC 9309 group precedence for Crawl-delay: the group naming the
    agent governs over *, regardless of file order — otherwise a site's
    explicit 60 s directive for this bot would be ignored in favor of the
    generic 1 s and the host crawled 60x too fast."""
    body = (
        "User-agent: *\nCrawl-delay: 1\n\n"
        "User-agent: mybot\nCrawl-delay: 60\n"
    )
    _, delay = py_parse_robots(body, agent="mybot")
    assert delay == 60.0
    # reversed order: specific still wins
    body2 = (
        "User-agent: mybot\nCrawl-delay: 60\n\n"
        "User-agent: *\nCrawl-delay: 1\n"
    )
    _, delay2 = py_parse_robots(body2, agent="mybot")
    assert delay2 == 60.0
    # an agent with no specific group gets the generic delay
    _, dstar = py_parse_robots(body, agent="otherbot")
    assert dstar == 1.0


def test_crawl_delay_nonpositive_dropped_and_budget_never_starves(spark):
    """'Crawl-delay: 0' must not reach the budget division: floor(epoch/0)
    is Infinity whose int cast wraps negative and permanently defers the
    host. The parser drops it AND effective_delay_expr clamps foreign
    robots tables."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.politeness import compute_budgets

    _, delay = py_parse_robots("User-agent: *\nCrawl-delay: 0\n")
    assert delay is None
    _, dneg = py_parse_robots("User-agent: *\nCrawl-delay: -5\n")
    assert dneg is None

    # a robots table that DID carry 0/negative (foreign source): budget
    # must still be a positive int, never a wrapped negative
    hosts = spark.createDataFrame([("a",), ("b",), ("c",)], "host string")
    robots = spark.createDataFrame(
        [("a", 0.0), ("b", -3.0), ("c", 2.0)], "host string, crawl_delay double"
    )
    got = {r["host"]: r["budget"] for r in compute_budgets(hosts, robots, None).collect()}
    assert all(v >= 1 for v in got.values()), got
    assert got["c"] == 15  # 30s epoch / 2s delay


def test_py_parse_robots_sitemaps_is_global_and_validating():
    from mcp_crawl4ai_rag_spark.sources.robots import py_parse_robots_sitemaps

    body = """# c
User-agent: specialbot
Disallow: /x
Sitemap: https://a.example.com/s1.xml
User-agent: *
Disallow: /private
Sitemap: https://a.example.com/s2.xml  # trailing comment
sitemap: HTTP://a.example.com/s3.xml
Sitemap: /relative/not/allowed.xml
Sitemap: https://a.example.com/s1.xml
Sitemap:
"""
    # global directive: collected from EVERY group (and outside groups),
    # case-insensitive key, scheme required, deduped in file order
    assert py_parse_robots_sitemaps(body) == [
        "https://a.example.com/s1.xml",
        "https://a.example.com/s2.xml",
        "HTTP://a.example.com/s3.xml",
    ]
    assert py_parse_robots_sitemaps("") == []


def test_robots_bodies_parse_equals_gen_robots_and_discovery(spark):
    """The raw-body corpus is self-consistent: parsing it reproduces the
    pre-parsed gen_robots table exactly, and discovery finds the
    closed-form sitemap set."""
    from mcp_crawl4ai_rag_spark.sources.corpus import (
        gen_robots,
        gen_robots_bodies,
    )
    from mcp_crawl4ai_rag_spark.sources.robots import (
        parse_robots_bodies,
        parse_robots_sitemaps,
    )

    bodies = gen_robots_bodies(spark)
    parsed = {
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay"])
        for r in parse_robots_bodies(bodies).collect()
    }
    want = {
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay"])
        for r in gen_robots(spark).collect()
    }
    assert parsed == want

    disc = sorted(
        (r["host"], r["sitemap_url"])
        for r in parse_robots_sitemaps(bodies).collect()
    )
    want_disc = []
    for h in range(10):
        host = f"h{h}.example.com"
        want_disc.append((host, f"https://{host}/sitemap_index.xml"))
        if h % 3 == 0:
            want_disc.append((host, f"https://{host}/sitemap_news.xml"))
    assert disc == sorted(want_disc)


def test_discovered_sitemap_feeds_expansion(spark):
    """Composition: the root q_sitemap_expand expands is exactly what
    discovery finds for host 1 — a crawler needs no caller-supplied
    sitemap list."""
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_robots_bodies
    from mcp_crawl4ai_rag_spark.sources.robots import parse_robots_sitemaps

    got = [
        r["sitemap_url"]
        for r in parse_robots_sitemaps(gen_robots_bodies(spark))
        .where("host = 'h1.example.com'")
        .collect()
    ]
    assert got == ["https://h1.example.com/sitemap_index.xml"]


def test_robots_sitemap_parser_total_under_arbitrary_bodies():
    """Hypothesis totality sweep: arbitrary text (including NULs, colons,
    huge lines) never crashes the sitemap parser; every output is an
    absolute http(s) URL present in the body; outputs are unique."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mcp_crawl4ai_rag_spark.sources.robots import (
        py_parse_robots,
        py_parse_robots_sitemaps,
    )

    @settings(max_examples=300, deadline=None)
    @given(body=st.text(max_size=400))
    def check(body):
        out = py_parse_robots_sitemaps(body)
        assert len(out) == len(set(out))
        for u in out:
            assert u.lower().startswith(("http://", "https://"))
            assert u in body
        # the directive parser stays total on the same inputs
        dis, delay = py_parse_robots(body)
        assert isinstance(dis, list)
        assert delay is None or delay > 0

    check()


BODY_ALLOW = """
User-agent: *
Disallow: /private
Disallow: /p/1
Allow: /private/p/1
Allow: /p/12
Crawl-delay: 2
"""


def test_py_parse_robots_rules_collects_allow_and_stays_compatible():
    from mcp_crawl4ai_rag_spark.sources.robots import py_parse_robots_rules

    dis, alw, delay = py_parse_robots_rules(BODY_ALLOW)
    assert dis == ["/private", "/p/1"]
    assert alw == ["/private/p/1", "/p/12"]
    assert delay == 2.0
    # the deny-only entrypoint is unchanged by the Allow lines
    assert py_parse_robots(BODY_ALLOW) == (["/private", "/p/1"], 2.0)
    # Allow only collected from selected groups
    other = "User-agent: otherbot\nAllow: /x\n\nUser-agent: *\nAllow: /y\n"
    assert py_parse_robots_rules(other)[1] == ["/y"]


def test_rfc_precedence_expr_matches_twin(spark):
    """robots_denied_rfc_expr == the Python twin on the RFC 9309 §2.2.2
    precedence matrix: longest match governs, Allow wins ties, no match
    = allowed, NULL rule arrays = allowed."""
    from mcp_crawl4ai_rag_spark.operators.politeness import (
        py_robots_denied_rfc,
        robots_denied_rfc_expr,
    )

    dis = ["/private", "/p/1"]
    alw = ["/private/p/1", "/p/12"]
    paths = [
        "/p/2",            # no match -> allowed
        "/private/p/2",    # disallow 8 only -> denied
        "/private/p/10",   # allow 12 > disallow 8 -> allowed
        "/p/10",           # disallow 4 only -> denied
        "/p/120",          # allow 5 > disallow 4 -> allowed
        "/p",              # prefix shorter than any rule -> allowed
    ]
    rows = [(p, dis, alw) for p in paths] + [("/private/x", None, None)]
    df = spark.createDataFrame(
        rows,
        "path string, disallow_prefixes array<string>, allow_prefixes array<string>",
    )
    got = {
        r["path"]: r["denied"]
        for r in df.select(
            "path", robots_denied_rfc_expr().alias("denied")
        ).collect()
    }
    for p, d, a in rows:
        assert got[p] == py_robots_denied_rfc(p, d, a), p
    # tie length -> Allow wins
    assert py_robots_denied_rfc("/a/b", ["/a/b"], ["/a/b"]) is False
    assert got["/private/p/10"] is False and got["/private/p/2"] is True


def test_engine_selects_rfc_gate_when_rules_have_allow(spark):
    """A crawl whose robots table carries allow_prefixes uses RFC
    precedence: an Allow rule re-opens a disallowed subtree, so strictly
    more pages fetch than under the deny-only table with the same
    Disallow lines."""
    from mcp_crawl4ai_rag_spark.plans.crawl import CrawlEngine
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_pages, gen_seeds
    from mcp_crawl4ai_rag_spark.sources.robots import (
        parse_robots_bodies,
        parse_robots_rules,
    )

    n = 300
    pages = gen_pages(spark, n, partitions=8)
    # every host: deny /private outright, but Allow re-opens /private/p/1*
    body = "User-agent: *\nDisallow: /private\nAllow: /private/p/1\n"
    bodies = spark.createDataFrame(
        [(f"h{h}.example.com", body) for h in range(10)],
        "host string, body string",
    )
    seeds = gen_seeds(spark, n)
    deny_only = CrawlEngine(
        spark, pages, robots=parse_robots_bodies(bodies),
        allowed_host_suffix=".example.com",
    ).run(seeds, max_depth=4)
    rfc = CrawlEngine(
        spark, pages, robots=parse_robots_rules(bodies),
        allowed_host_suffix=".example.com",
    ).run(seeds, max_depth=4)
    deny_fetched = {r["canonical_url"] for r in deny_only.fetched.collect()}
    rfc_fetched = {r["canonical_url"] for r in rfc.fetched.collect()}
    reopened = rfc_fetched - deny_fetched
    # non-vacuous at n=300/depth=4: /private/p/123 is reachable and re-opened
    assert reopened and all("/private/p/1" in u for u in reopened)
    denied_still = {
        u for u in rfc.url_seen.toPandas()["canonical_url"]
        if "/private/" in u and "/private/p/1" not in u
    }
    assert denied_still.isdisjoint(rfc_fetched)


def test_compile_robots_pattern_pinned():
    from mcp_crawl4ai_rag_spark.sources.robots import py_compile_robots_pattern

    # '*' -> '.*', trailing '$' anchors, specificity = raw octet length
    assert py_compile_robots_pattern("/p/*4$") == ("^/p/.*4$", 6)
    assert py_compile_robots_pattern("/private") == ("^/private", 8)
    # '$' mid-rule is a literal octet, only the trailing one anchors
    rx, spec = py_compile_robots_pattern("/a$b*c$")
    assert rx == "^/a\\$b.*c$" and spec == 7
    # regex metacharacters in paths are escaped (a '.' must not wildcard)
    rx, _ = py_compile_robots_pattern("/file.php")
    import re

    assert re.search(rx, "/file.php") and not re.search(rx, "/fileXphp")


def test_wildcard_gate_matches_twin(spark):
    import re

    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.politeness import (
        py_robots_denied_wildcard,
        robots_denied_wildcard_expr,
    )
    from mcp_crawl4ai_rag_spark.sources.robots import (
        compile_rule_patterns,
        parse_robots_rules,
    )

    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Disallow: /p/*4$\n"
        "Allow: /p/*44$\n"
        "Disallow: /p/1*3\n"
        "Allow: /private/p/*9$\n"
    )
    dis = ["/private", "/p/*4$", "/p/1*3"]
    alw = ["/p/*44$", "/private/p/*9$"]
    bodies = spark.createDataFrame(
        [("h0.example.com", body)], "host string, body string"
    )
    pats = compile_rule_patterns(parse_robots_rules(bodies)).drop("host")
    paths = [
        "/p/4", "/p/44", "/p/144", "/p/123", "/p/13", "/p/103",
        "/p/7", "/private/p/3", "/private/p/9", "/private/p/19",
        "/p/1234", "/p/443", "/p/434",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    rows = df.crossJoin(F.broadcast(pats)).select(
        "path", robots_denied_wildcard_expr().alias("denied")
    ).collect()
    for r in rows:
        assert r["denied"] == py_robots_denied_wildcard(r["path"], dis, alw), r
    got = {r["path"]: r["denied"] for r in rows}
    # pinned semantics: tie in specificity is impossible here; Allow with
    # more octets re-opens /p/44 and /private/p/9 under broader Disallows
    assert got["/p/44"] is False and got["/p/4"] is True
    assert got["/private/p/9"] is False and got["/private/p/3"] is True
    # '$' really anchors: /p/443 does NOT end in 4 -> only 1*3-free paths pass
    assert got["/p/443"] is False and got["/p/434"] is True


def test_wildcard_subsumes_prefix_gate(spark):
    """On a wildcard-free rules table the wildcard gate must agree with
    the RFC prefix gate on every path."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.politeness import (
        robots_denied_rfc_expr,
        robots_denied_wildcard_expr,
    )
    from mcp_crawl4ai_rag_spark.sources.robots import (
        compile_rule_patterns,
        parse_robots_rules,
    )

    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Disallow: /p/1\n"
        "Allow: /private/p/1\n"
        "Allow: /p/12\n"
    )
    bodies = spark.createDataFrame(
        [("h0.example.com", body)], "host string, body string"
    )
    rules = parse_robots_rules(bodies).drop("host")
    pats = compile_rule_patterns(parse_robots_rules(bodies)).drop("host")
    paths = spark.range(0, 300).select(
        F.when(
            F.col("id") % 3 == 0,
            F.concat(F.lit("/private/p/"), F.col("id").cast("string")),
        ).otherwise(F.concat(F.lit("/p/"), F.col("id").cast("string"))).alias("path")
    )
    a = paths.crossJoin(F.broadcast(rules)).select(
        "path", robots_denied_rfc_expr().alias("d")
    )
    b = paths.crossJoin(F.broadcast(pats)).select(
        "path", robots_denied_wildcard_expr().alias("d")
    )
    assert {(r["path"], r["d"]) for r in a.collect()} == {
        (r["path"], r["d"]) for r in b.collect()
    }


def test_engine_selects_wildcard_gate(spark):
    """CrawlEngine with a compiled-pattern robots table enforces wildcard
    denials: '$'-anchored rules deny exactly their match set during a real
    crawl, and the denial lands in lineage."""
    from mcp_crawl4ai_rag_spark.plans.crawl import CrawlEngine
    from mcp_crawl4ai_rag_spark.sources.corpus import N_HOSTS, gen_pages, gen_seeds
    from mcp_crawl4ai_rag_spark.sources.robots import (
        compile_rule_patterns,
        parse_robots_rules,
    )
    from mcp_crawl4ai_rag_spark.operators.politeness import py_robots_denied_wildcard

    n = 300
    body = "User-agent: *\nDisallow: /p/*1$\nDisallow: /private\n"
    bodies = spark.createDataFrame(
        [(f"h{h}.example.com", body) for h in range(N_HOSTS)],
        "host string, body string",
    )
    pats = compile_rule_patterns(parse_robots_rules(bodies))
    pages = gen_pages(spark, n)
    res = CrawlEngine(
        spark, pages, robots=pats, allowed_host_suffix=".example.com"
    ).run(gen_seeds(spark, n), max_depth=4)
    fetched = {r["canonical_url"] for r in res.fetched.collect()}
    assert fetched  # non-vacuous
    for u in fetched:
        path = "/" + u.split("://", 1)[1].split("/", 1)[1]
        assert not py_robots_denied_wildcard(path, ["/p/*1$", "/private"], []), u
    # denials recorded: the reachable set at n=300 includes paths ending in 1
    denials = sum(r["robots_denials"] for r in res.lineage.collect())
    assert denials > 0


def test_robots_status_semantics(spark):
    """RFC 9309 section 2.3.1: 2xx parses, 4xx allows all, 5xx/None/3xx
    fully disallows; the table drops into CrawlEngine unchanged."""
    from mcp_crawl4ai_rag_spark.sources.robots import (
        py_robots_status_rules,
        robots_table_from_fetch,
    )

    body = "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n"
    assert py_robots_status_rules(200, body) == (["/private"], [], 2.0)
    assert py_robots_status_rules(404, body) == ([], [], None)
    assert py_robots_status_rules(403, None) == ([], [], None)
    assert py_robots_status_rules(500, body) == (["/"], [], None)
    assert py_robots_status_rules(None, None) == (["/"], [], None)
    assert py_robots_status_rules(301, body) == (["/"], [], None)

    fetched = spark.createDataFrame(
        [
            ("h200.example.com", 200, body),
            ("h404.example.com", 404, None),
            ("h500.example.com", 500, None),
            ("hnone.example.com", None, None),
        ],
        "host string, status int, body string",
    )
    rows = {
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay"])
        for r in robots_table_from_fetch(fetched).collect()
    }
    assert rows == {
        "h200.example.com": (["/private"], 2.0),
        "h404.example.com": ([], None),
        "h500.example.com": (["/"], None),
        "hnone.example.com": (["/"], None),
    }


def test_robots_status_engine_closure(spark):
    """A host whose robots fetch 5xx'd is fully closed during a crawl; a
    4xx host is fully open — same seeds, same corpus, only the robots
    fetch status differs."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.plans.crawl import CrawlEngine
    from mcp_crawl4ai_rag_spark.sources.corpus import N_HOSTS, gen_pages, gen_seeds
    from mcp_crawl4ai_rag_spark.sources.robots import robots_table_from_fetch

    n = 300
    # h1 unreachable (500) -> fully disallowed; everyone else 404 -> open
    fetched = spark.createDataFrame(
        [
            (f"h{h}.example.com", 500 if h == 1 else 404, None)
            for h in range(N_HOSTS)
        ],
        "host string, status int, body string",
    )
    robots = robots_table_from_fetch(fetched)
    res = CrawlEngine(
        spark, gen_pages(spark, n), robots=robots,
        allowed_host_suffix=".example.com",
    ).run(gen_seeds(spark, n), max_depth=4)
    fetched_hosts = {r["host"] for r in res.fetched.collect()}
    assert "h1.example.com" not in fetched_hosts
    assert len(fetched_hosts) > 1  # others crawled
    denials = sum(r["robots_denials"] for r in res.lineage.collect())
    assert denials > 0


def test_property_wildcard_free_rules_equal_prefix_semantics():
    """For rules with no '*' and no trailing '$', the wildcard gate's
    per-rule match is exactly startswith — the subsumption law behind
    robots_denied_wildcard_expr replacing the prefix gate."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mcp_crawl4ai_rag_spark.sources.robots import py_compile_robots_pattern

    seg = st.text(alphabet="ab/.c-_%()[]{}+?^", min_size=0, max_size=12)

    @given(rule=seg, path=seg)
    @settings(max_examples=400, deadline=None)
    def run(rule, path):
        if rule.endswith("$"):
            rule = rule + "x"  # keep it wildcard-free in the trailing sense
        rx, spec = py_compile_robots_pattern(rule)
        assert spec == len(rule)
        assert bool(re.search(rx, path)) == path.startswith(rule)

    run()


def test_wildcard_query_rules_and_match_target(spark):
    """'Disallow: /*?sessionid=*' — the canonical real-world wildcard —
    denies query-bearing URLs: the match target is path INCLUDING query
    (RFC 9309 family semantics: '/*.php' matches '/index.php?params')."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.functions.urls import (
        py_url_path_query,
        url_path_query,
    )
    from mcp_crawl4ai_rag_spark.operators.politeness import (
        py_robots_denied_wildcard,
        robots_denied_wildcard_expr,
    )
    from mcp_crawl4ai_rag_spark.sources.robots import (
        compile_rule_patterns,
        parse_robots_rules,
    )

    body = "User-agent: *\nDisallow: /*?sessionid=*\nDisallow: /*.php$\n"
    bodies = spark.createDataFrame(
        [("h.example.com", body)], "host string, body string"
    )
    pats = compile_rule_patterns(parse_robots_rules(bodies)).drop("host")
    urls = [
        ("https://h.example.com/x?sessionid=abc", True),
        ("https://h.example.com/x?other=1", False),
        ("https://h.example.com/x", False),
        ("https://h.example.com/index.php", True),
        ("https://h.example.com/index.php?parameters", False),  # '$' anchors
        # '?sessionid=' is a LITERAL octet sequence: '&sessionid=' does
        # not match it (a site closing both writes '/*sessionid=*')
        ("https://h.example.com/a/b?q=1&sessionid=2", False),
        ("https://h.example.com/a/b?sessionid=2&q=1", True),
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "canonical_url string")
    rows = df.crossJoin(F.broadcast(pats)).select(
        "canonical_url",
        url_path_query(F.col("canonical_url")).alias("tgt"),
        robots_denied_wildcard_expr(
            url_path_query(F.col("canonical_url"))
        ).alias("denied"),
    ).collect()
    want = dict(urls)
    dis = ["/*?sessionid=*", "/*.php$"]
    for r in rows:
        assert r["denied"] == want[r["canonical_url"]], r["canonical_url"]
        assert r["tgt"] == py_url_path_query(r["canonical_url"])
        assert r["denied"] == py_robots_denied_wildcard(r["tgt"], dis, [])


def test_fetch_table_wildcards_are_not_dead_letters(spark):
    """robots_table_from_fetch compiles patterns, so 'Disallow: /*' fully
    closes a site through the engine (a prefix gate would treat '/*' as a
    dead letter and crawl everything)."""
    from mcp_crawl4ai_rag_spark.plans.crawl import CrawlEngine
    from mcp_crawl4ai_rag_spark.sources.corpus import N_HOSTS, gen_pages, gen_seeds
    from mcp_crawl4ai_rag_spark.sources.robots import robots_table_from_fetch

    n = 300
    body = "User-agent: *\nDisallow: /*\n"
    fetched = spark.createDataFrame(
        [(f"h{h}.example.com", 200, body) for h in range(N_HOSTS)],
        "host string, status int, body string",
    )
    robots = robots_table_from_fetch(fetched)
    assert "disallow_pats" in robots.columns
    res = CrawlEngine(
        spark, gen_pages(spark, n), robots=robots,
        allowed_host_suffix=".example.com",
    ).run(gen_seeds(spark, n), max_depth=3)
    assert res.fetched.count() == 0  # everything denied
    denials = sum(r["robots_denials"] for r in res.lineage.collect())
    assert denials > 0
