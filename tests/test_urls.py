"""Differential tests: Spark URL kernels vs the reference semantics.

The oracles are the ``py_*`` twins in functions/urls.py, which reimplement
the reference functions (src/crawl4ai_mcp.py:105-173) line-for-line in
behavior; the cases below include hand-derived expected values straight from
the reference code so the twins themselves are pinned too.
"""

from urllib.parse import urljoin

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions.urls import (
    canonical_url,
    classify_url,
    comparison_normalize,
    is_binary_url,
    is_sitemap_url,
    is_txt_url,
    is_valid_http_url,
    py_canonical_url,
    py_comparison_normalize,
    py_derive_prefix,
    py_is_binary_url,
    py_is_sitemap,
    py_is_txt,
    resolve_href,
)

URLS = [
    "https://example.com/a/b/c",
    "https://example.com/a/b/c/",
    "https://example.com/a/b/c///",
    "http://example.com/a#frag",
    "https://example.com/file.PDF",
    "https://example.com/archive.tar.gz",
    "https://example.com/sitemap.xml",
    "https://example.com/sitemap.xml.gz",
    "https://example.com/sitemap_index.xml",
    "https://example.com/sub/sitemap-news.xml",
    "https://example.com/SITEMAP.XML",
    "https://example.com/notes.txt",
    "https://example.com/notes.TXT",
    "https://example.com/image.jpeg",
    "https://example.com/data.XML.GZ",
    "https://example.com/page?q=1#x",
    "https://example.com",
    "https://example.com/",
    "HTTPS://EXAMPLE.COM/Path",
    "https://h0.example.com/p/1",
    "https://example.com/a.b/c.d.e",
    "https://example.com/has sitemap in path/x",
    "https://example.com/deep/x.woff2",
    "https://example.com/x.png#frag",
]


def _spark_eval(spark, expr_fn, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(expr_fn(F.col("url"))).collect()]


def test_canonical_url_matches(spark):
    got = _spark_eval(spark, canonical_url, URLS)
    assert got == [py_canonical_url(u) for u in URLS]


def test_comparison_normalize_matches(spark):
    got = _spark_eval(spark, comparison_normalize, URLS)
    assert got == [py_comparison_normalize(u) for u in URLS]


def test_binary_filter_matches(spark):
    got = _spark_eval(spark, is_binary_url, URLS)
    assert got == [py_is_binary_url(u) for u in URLS]


def test_binary_filter_pinned_cases():
    # hand-pinned from reference src/crawl4ai_mcp.py:121-144
    assert py_is_binary_url("https://x/file.pdf")
    assert py_is_binary_url("https://x/FILE.PDF")
    assert not py_is_binary_url("https://x/sitemap.xml.gz")  # exemption
    assert py_is_binary_url("https://x/data.gz")  # plain .gz IS binary
    assert not py_is_binary_url("https://x/page.html")
    assert py_is_binary_url("https://x/font.woff2")


def test_sitemap_classifier_matches(spark):
    got = _spark_eval(spark, is_sitemap_url, URLS)
    assert got == [py_is_sitemap(u) for u in URLS]


def test_txt_classifier_matches(spark):
    got = _spark_eval(spark, is_txt_url, URLS)
    # reference is_txt is case-SENSITIVE (src/crawl4ai_mcp.py:173)
    assert got == [py_is_txt(u) for u in URLS]
    assert py_is_txt("https://x/a.txt") and not py_is_txt("https://x/a.TXT")


def test_classify_dispatch_order(spark):
    # txt beats sitemap (reference dispatch :699-758 checks is_txt first)
    got = _spark_eval(spark, classify_url, ["https://x/sitemap.txt"])
    assert got == ["text_file"]


def test_valid_http(spark):
    urls = ["https://x.com/a", "ftp://x.com", "not a url", "http://y", ""]
    got = _spark_eval(spark, is_valid_http_url, urls)
    assert got == [True, False, False, True, False]


HREFS = [
    ("https://h0.example.com/p/1", "https://h1.example.com/p/2"),
    ("https://h0.example.com/p/1", "/p/9"),
    ("https://h0.example.com/p/1", "../p/7"),
    ("https://h0.example.com/a/b/c", "../../x"),
    ("https://h0.example.com/p/1", "p/7"),
    ("https://h0.example.com/p/1", "#frag"),
    ("https://h0.example.com/p/1?q=2", "?q=3"),
    ("https://h0.example.com/p/1", "//cdn.example.com/x"),
    ("https://h0.example.com/p/1", ""),
    ("https://h0.example.com/private/p/41", "../p/3"),
]


def test_resolve_href_matches_urljoin(spark):
    df = spark.createDataFrame(HREFS, "base string, href string")
    got = [r[0] for r in df.select(resolve_href(F.col("base"), F.col("href"))).collect()]
    want = [urljoin(b, h) if h else b for b, h in HREFS]
    assert got == want


@pytest.mark.parametrize(
    "url,want",
    [
        # hand-derived from reference :663-680
        ("https://example.com/docs/guide/", "https://example.com/docs/guide"),
        ("https://example.com/docs/page.html", "https://example.com/docs"),
        ("https://example.com/", "https://example.com"),
        ("https://example.com", "https://example.com"),
        ("https://example.com/a", "https://example.com/a"),
        ("https://example.com/a/.hidden", "https://example.com/a/.hidden"),
    ],
)
def test_derive_prefix(url, want):
    assert py_derive_prefix(url) == want


def test_is_internal_href_protocol_relative_and_opaque_schemes(spark):
    """Protocol-relative, uppercase-scheme, and non-hierarchical hrefs must
    not fall through to 'relative => internal'."""
    from mcp_crawl4ai_rag_spark.functions.urls import with_link_counts

    rows = [(
        "https://a.example.com/p",
        [
            "/x",                          # relative -> internal
            "//evil.com/x",                # proto-relative other host -> external
            "//a.example.com/y",           # proto-relative same host -> internal
            "HTTP://evil.com/x",           # uppercase scheme -> external
            "mailto:bob@other.com",        # opaque -> external
            "javascript:void(0)",          # opaque -> external
            "https://a.example.com/z",     # absolute same host -> internal
        ],
    )]
    df = spark.createDataFrame(rows, "url string, out_links array<string>")
    got = with_link_counts(df).select("n_internal", "n_external").head()
    assert (got["n_internal"], got["n_external"]) == (3, 4)


def test_keyword_relevance_twin_and_best_first_order(spark):
    """Spark keyword_relevance_milli == the Python twin on mixed URLs, and
    best-first priority sorts keyword-relevant URLs ahead of the rest
    (crawl4ai BestFirstCrawlingStrategy pop order within a depth level)."""
    from mcp_crawl4ai_rag_spark.functions.urls import (
        best_first_priority,
        keyword_relevance_milli,
        py_keyword_relevance_milli,
    )

    kws = ["private", "readme", "sitemap"]
    urls = [
        "https://h1.example.com/p/1",                 # 0 hits
        "https://h1.example.com/PRIVATE/p/2",         # case-insensitive hit
        "https://h1.example.com/p/3/readme.txt",      # 1 hit
        "https://h1.example.com/private/sitemap.xml", # 2 hits
        "https://h1.example.com/p/4#readme",          # fragment still scores
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: (r["milli"], r["prio"])
        for r in df.select(
            "url",
            keyword_relevance_milli("url", kws).alias("milli"),
            best_first_priority("url", kws).alias("prio"),
        ).collect()
    }
    for u in urls:
        want = py_keyword_relevance_milli(u, kws)
        assert got[u] == (want, -want), u
    # best-first: ascending priority pops the 2-hit URL first, 0-hit last
    ordered = sorted(urls, key=lambda u: (got[u][1], u))
    assert ordered[0] == "https://h1.example.com/private/sitemap.xml"
    assert ordered[-1] == "https://h1.example.com/p/1"


def test_keyword_relevance_empty_keywords(spark):
    from mcp_crawl4ai_rag_spark.functions.urls import (
        keyword_relevance_milli,
        py_keyword_relevance_milli,
    )

    df = spark.createDataFrame([("https://h1.example.com/p/1",)], "url string")
    assert df.select(keyword_relevance_milli("url", []).alias("m")).head()["m"] == 0
    assert py_keyword_relevance_milli("x", []) == 0


def test_scorer_family_matches_twins(spark):
    """PathDepth / Freshness / DomainAuthority / Composite scorers equal
    their Python twins across depth, year, host, and no-match cases."""
    from mcp_crawl4ai_rag_spark.functions.urls import (
        composite_priority,
        domain_authority_milli,
        freshness_score_milli,
        keyword_relevance_milli,
        path_depth_score_milli,
        py_composite_priority,
        py_domain_authority_milli,
        py_freshness_score_milli,
        py_keyword_relevance_milli,
        py_path_depth_score_milli,
    )

    kws = ["private", "readme"]
    da = {"H0.example.com": 900, "h1.example.com": 700}
    now = 2026
    urls = [
        "https://h0.example.com/",                       # depth 0
        "https://h1.example.com/a/b/c",                  # optimal depth
        "https://h2.example.com/a/b/c/d/e/f",            # deep
        "https://h0.example.com/2019/post",              # stale year
        "https://h1.example.com/2026/readme.txt",        # fresh year
        "https://h2.example.com/1989/old",               # pre-window year? (1989 matches 19xx)
        "https://h3.example.com/p/12019",                # year inside an id
        "https://H0.EXAMPLE.COM/private/x",              # host case-insensitive
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    u = F.col("url")
    got = {
        r["url"]: r
        for r in df.select(
            "url",
            path_depth_score_milli(u, 3).alias("pd"),
            freshness_score_milli(u, now).alias("fr"),
            domain_authority_milli(u, da, 500).alias("da"),
            composite_priority(
                [
                    (keyword_relevance_milli(u, kws), 500),
                    (path_depth_score_milli(u, 3), 250),
                    (freshness_score_milli(u, now), 125),
                    (domain_authority_milli(u, da, 500), 125),
                ]
            ).alias("prio"),
        ).collect()
    }
    for url in urls:
        r = got[url]
        assert r["pd"] == py_path_depth_score_milli(url, 3), url
        assert r["fr"] == py_freshness_score_milli(url, now), url
        assert r["da"] == py_domain_authority_milli(url, da, 500), url
        want = py_composite_priority(
            [
                (py_keyword_relevance_milli(url, kws), 500),
                (py_path_depth_score_milli(url, 3), 250),
                (py_freshness_score_milli(url, now), 125),
                (py_domain_authority_milli(url, da, 500), 125),
            ]
        )
        assert r["prio"] == want, url
    # empty family / empty weights degenerate paths
    assert py_composite_priority([]) == 0
    row = df.limit(1).select(
        composite_priority([]).alias("z"),
        domain_authority_milli(u, {}, 650).alias("d"),
    ).head()
    assert (row["z"], row["d"]) == (0, 650)


def test_url_pattern_match_and_filter_chain(spark):
    """URLPatternFilter glob kernel == fnmatchcase twin; FilterChain is a
    plain AND fold with an empty-chain pass-all default."""
    from mcp_crawl4ai_rag_spark.functions.urls import (
        filter_chain,
        is_binary_url,
        py_url_pattern_match,
        url_pattern_match,
    )

    pats = ["*/docs/*", "*.txt", "*sitemap*", "https://h?.example.com/p/1"]
    urls = [
        "https://h1.example.com/docs/guide",       # */docs/* hit
        "https://h1.example.com/readme.txt",       # *.txt hit
        "https://h1.example.com/sitemap_index.xml",
        "https://h1.example.com/p/1",              # ? single-char hit
        "https://h10.example.com/p/1",             # ? must NOT span 2 chars
        "https://h1.example.com/p/2",
        "https://h1.example.com/Docs/guide",       # case-sensitive miss
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["hit"]
        for r in df.select(
            "url", url_pattern_match("url", pats).alias("hit")
        ).collect()
    }
    for u in urls:
        assert got[u] == py_url_pattern_match(u, pats), u
    assert got["https://h1.example.com/p/1"] is True
    assert got["https://h10.example.com/p/1"] is False
    assert got["https://h1.example.com/Docs/guide"] is False
    # empty pattern list matches nothing
    row = df.limit(1).select(url_pattern_match("url", []).alias("z")).head()
    assert row["z"] is False
    # chain: pattern-pass AND not-binary; empty chain passes all
    chained = df.select(
        "url",
        filter_chain(
            [url_pattern_match("url", ["*h1.example.com*"]), ~is_binary_url("url")]
        ).alias("keep"),
        filter_chain([]).alias("all_pass"),
    ).collect()
    for r in chained:
        assert r["all_pass"] is True
        want = py_url_pattern_match(r["url"], ["*h1.example.com*"]) and not r[
            "url"
        ].endswith(".pdf")
        assert r["keep"] == want, r["url"]


def test_canonical_url_strict_matches_twin(spark):
    """Strict canonicalization: scheme/host case, default ports, tracking
    params, query sort, fragment — Spark == the urlsplit twin."""
    from mcp_crawl4ai_rag_spark.functions.urls import (
        canonical_url_strict,
        py_canonical_url_strict,
    )

    urls = [
        "HTTP://Example.COM:80/a?b=2&a=1#frag",
        "https://example.com:443/x?utm_source=tw&z=9&utm_medium=m",
        "https://example.com:8443/x?a=1",          # non-default port kept
        "http://example.com/p?fbclid=abc&gclid=d", # all tracking -> no query
        "https://example.com/p?ref=home&refresh=1",# exact 'ref' dropped, 'refresh' KEPT
        "https://example.com/CaseInPath?B=2&a=1",  # path case kept; names sort before lowercase letters
        "https://example.com/q?a=1&a=0",           # duplicate names sort by whole segment
        "https://example.com/plain",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["s"]
        for r in df.select(
            "url", canonical_url_strict("url").alias("s")
        ).collect()
    }
    for u in urls:
        assert got[u] == py_canonical_url_strict(u), (u, got[u])
    assert got["HTTP://Example.COM:80/a?b=2&a=1#frag"] == "http://example.com/a?a=1&b=2"
    assert got["http://example.com/p?fbclid=abc&gclid=d"] == "http://example.com/p"
    assert got["https://example.com:8443/x?a=1"] == "https://example.com:8443/x?a=1"
    assert got["https://example.com/p?ref=home&refresh=1"] == "https://example.com/p?refresh=1"


# --- property tests (pure-Python twins; the Spark==twin equivalence is
# pinned by the example-based tests above and the url_kernels oracle) ---

def test_property_strict_canonical_idempotent_and_total():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mcp_crawl4ai_rag_spark.functions.urls import py_canonical_url_strict

    seg = st.text(
        alphabet="abcXYZ019-._~", min_size=0, max_size=6
    )
    params = st.lists(
        st.tuples(
            st.sampled_from(
                ["a", "b", "zz", "utm_source", "utm_x", "ref", "refresh",
                 "fbclid", "gclid", "Ref"]
            ),
            seg,
        ),
        max_size=5,
    )

    @given(
        scheme=st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
        host=st.sampled_from(
            ["Example.com", "h1.example.com", "EX.com:80", "ex.com:443",
             "ex.com:8080"]
        ),
        path=st.lists(seg, max_size=3),
        ps=params,
        frag=seg,
    )
    @settings(max_examples=200, deadline=None)
    def run(scheme, host, path, ps, frag):
        url = f"{scheme}://{host}/" + "/".join(path)
        if ps:
            url += "?" + "&".join(f"{k}={v}" for k, v in ps)
        if frag:
            url += f"#{frag}"
        out = py_canonical_url_strict(url)
        # idempotent: canonicalizing a canonical URL is a no-op
        assert py_canonical_url_strict(out) == out
        # no fragment, no tracking params survive; query is sorted
        assert "#" not in out
        if "?" in out:
            q = out.split("?", 1)[1]
            segs = q.split("&")
            assert segs == sorted(segs)
            for s_ in segs:
                name = s_.split("=", 1)[0]
                assert not name.startswith("utm_")
                assert name not in ("fbclid", "gclid", "msclkid", "mc_eid", "ref")
        # scheme and host are lowercased, default ports gone
        sch, rest = out.split("://", 1)
        assert sch == sch.lower()
        hostpart = rest.split("/", 1)[0]
        assert hostpart == hostpart.lower()
        assert not (sch == "http" and hostpart.endswith(":80"))
        assert not (sch == "https" and hostpart.endswith(":443"))

    run()


def test_property_glob_translation_matches_fnmatch():
    from fnmatch import fnmatchcase

    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mcp_crawl4ai_rag_spark.functions.urls import _glob_to_regex

    # bracket-free glob alphabet (char classes documented-unsupported)
    pat = st.text(alphabet="ab/.*?x-", min_size=0, max_size=8)
    txt = st.text(alphabet="ab/.x-", min_size=0, max_size=10)

    @given(p=pat, t=txt)
    @settings(max_examples=300, deadline=None)
    def run(p, t):
        assert bool(_re.fullmatch(_glob_to_regex(p)[1:-1], t)) == fnmatchcase(t, p)

    run()


def test_property_keyword_score_bounds_and_monotonicity():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mcp_crawl4ai_rag_spark.functions.urls import py_keyword_relevance_milli

    kws = st.lists(st.text(alphabet="abcz/", min_size=1, max_size=4),
                   min_size=1, max_size=5)

    @given(url=st.text(alphabet="abcz/:.", max_size=30), keywords=kws)
    @settings(max_examples=300, deadline=None)
    def run(url, keywords):
        m = py_keyword_relevance_milli(url, keywords)
        assert 0 <= m <= 1000
        # appending a keyword occurrence never lowers the score
        m2 = py_keyword_relevance_milli(url + keywords[0], keywords)
        assert m2 >= m

    run()


TRAP_URLS = [
    # pathological repeats
    "https://example.com/a/a/a/page",
    "https://example.com/a/a/page",          # run 2: allowed
    "https://example.com/cal/2024/01/cal/2024/01/cal/2024/01",
    "https://example.com/x/x",
    "https://example.com/x/y/x/y/x/y",       # alternating, no consecutive run
    # deep paths
    "https://example.com/" + "/".join(f"s{i}" for i in range(21)),
    "https://example.com/" + "/".join(f"s{i}" for i in range(20)),
    # query-param explosions
    "https://example.com/p?" + "&".join(f"q{i}=1" for i in range(11)),
    "https://example.com/p?" + "&".join(f"q{i}=1" for i in range(10)),
    "https://example.com/p?&&&a=1",          # empty params don't count
    # long URLs
    "https://example.com/" + "z" * 2100,
    "https://example.com/" + "z" * 2000,
    # benign
    "https://example.com/",
    "https://example.com",
    "https://example.com/p/1",
    "https://h0.example.com/private/p/41",
    # scheme-less / relative: kernel path extraction yields '' (no
    # 'scheme://'), so path-based signals are 0 — the twins must agree
    "/a/a/a/a",
    "example.com/a/a/a/a",
    "/p?%s" % "&".join(f"q{i}=1" for i in range(11)),
    "//example.com/x/x/x/x",
]


def test_crawl_trap_matches_twin(spark):
    from mcp_crawl4ai_rag_spark.functions.urls import (
        is_crawl_trap,
        max_segment_run,
        py_is_crawl_trap,
        py_max_segment_run,
        query_param_count,
    )

    urls = URLS + TRAP_URLS
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        max_segment_run(F.col("url")).alias("run"),
        query_param_count(F.col("url")).alias("np"),
        is_crawl_trap(F.col("url")).alias("trap"),
    ).collect()
    from urllib.parse import urlsplit

    for r in rows:
        assert r["run"] == py_max_segment_run(r["url"]), r["url"]
        p = urlsplit(r["url"])
        want_np = len([s for s in p.query.split("&") if s]) if p.query else 0
        assert r["np"] == want_np, r["url"]
        assert r["trap"] == py_is_crawl_trap(r["url"]), r["url"]


def test_crawl_trap_pinned_cases():
    from mcp_crawl4ai_rag_spark.functions.urls import (
        py_is_crawl_trap,
        py_max_segment_run,
    )

    # Heritrix pathological-path rule: 2 consecutive repeats pass, 3 trip
    assert not py_is_crawl_trap("https://e.com/a/a/page")
    assert py_is_crawl_trap("https://e.com/a/a/a/page")
    assert py_max_segment_run("https://e.com/a/a/a/page") == 3
    # alternating segments never build a consecutive run
    assert py_max_segment_run("https://e.com/x/y/x/y/x/y") == 1
    # boundary: exactly 20 segments pass, 21 trip
    base = "https://e.com/"
    assert not py_is_crawl_trap(base + "/".join("s%d" % i for i in range(20)))
    assert py_is_crawl_trap(base + "/".join("s%d" % i for i in range(21)))
    # boundary: exactly 10 params pass, 11 trip
    assert not py_is_crawl_trap("https://e.com/p?" + "&".join("q%d=1" % i for i in range(10)))
    assert py_is_crawl_trap("https://e.com/p?" + "&".join("q%d=1" % i for i in range(11)))
    # boundary: length 2048 passes, 2049 trips
    stem = "https://e.com/"
    assert not py_is_crawl_trap(stem + "z" * (2048 - len(stem)))
    assert py_is_crawl_trap(stem + "z" * (2049 - len(stem)))
    # empty path
    assert py_max_segment_run("https://e.com") == 0
    assert not py_is_crawl_trap("https://e.com")


def test_crawl_trap_zero_shuffle_plan(spark):
    """The trap guard must stay a single codegen projection: no Exchange,
    no Python eval in the plan."""
    from mcp_crawl4ai_rag_spark.functions.urls import is_crawl_trap

    df = spark.range(0, 1000, 1, 4).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url")
    )
    out = df.select(is_crawl_trap(F.col("url")).alias("trap"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_crawl_trap_filter_chain_composition(spark):
    """~is_crawl_trap composes into filter_chain and prunes trap URLs from
    a discovered-link batch while keeping benign ones."""
    from mcp_crawl4ai_rag_spark.functions.urls import (
        filter_chain,
        is_crawl_trap,
        is_valid_http_url,
    )

    urls = [
        "https://example.com/p/1",
        "https://example.com/a/a/a/a",
        "https://example.com/p?'" + "&".join("q%d=1" % i for i in range(12)),
        "https://example.com/p/2",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    kept = [
        r[0]
        for r in df.where(
            filter_chain([is_valid_http_url(F.col("url")), ~is_crawl_trap(F.col("url"))])
        ).select("url").collect()
    ]
    assert kept == ["https://example.com/p/1", "https://example.com/p/2"]


def test_url_template_matches_twin(spark):
    from mcp_crawl4ai_rag_spark.functions.urls import py_url_template, url_template

    urls = URLS + TRAP_URLS + [
        "https://e.com/2024/01/15/post-title",
        "https://e.com/user/deadbeefcafe1234/profile",
        "https://e.com/item?id=99&sort=asc&id=12",
        "https://E.COM/Mixed/Case/PATH",
        "https://e.com/s17/item-4/x",
        "https://e.com/" + "q" * 40 + "/end",
        "https://e.com/sess/DEADBEEF/view",
        "https://e.com/sess/DeAdBeEfCaFe0123",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", url_template(F.col("url")).alias("t")).collect()
    for r in rows:
        assert r["t"] == py_url_template(r["url"]), r["url"]


def test_url_template_pinned_classes():
    from mcp_crawl4ai_rag_spark.functions.urls import py_url_template

    # digits -> N, hex>=8 -> H, >32 chars -> L, digit-bearing -> S
    assert py_url_template("https://e.com/2024/01/page") == "e.com/N/N/page"
    assert (
        py_url_template("https://e.com/user/deadbeefcafe1234/x")
        == "e.com/user/H/x"
    )
    assert py_url_template("https://e.com/" + "q" * 40) == "e.com/L"
    assert py_url_template("https://e.com/s17/item-4") == "e.com/S/S"
    # 7-char hex is NOT H (min 8): digit-bearing -> S; pure alpha stays
    assert py_url_template("https://e.com/deadbe1/beta") == "e.com/S/beta"
    # hex ids are case-blind (ADVICE r4): an UPPERCASE all-alpha hex
    # segment generalizes to H like its lowercase twin — same family
    assert py_url_template("https://e.com/s/DEADBEEF") == "e.com/s/H"
    assert py_url_template("https://e.com/s/DeAdBeEfCaFe/x") == "e.com/s/H/x"
    # query values dropped, names sorted, duplicates kept; host lowercased
    assert (
        py_url_template("https://E.com/item?id=99&sort=asc&id=12")
        == "e.com/item?id&id&sort"
    )
    # the whole family collapses: calendar pages share one template
    fam = {
        py_url_template(f"https://e.com/cal/{y}/{m}/{d}")
        for y in (2024, 2025) for m in (1, 7) for d in (3, 28)
    }
    assert fam == {"e.com/cal/N/N/N"}


def test_template_explosion_and_guard(spark):
    from mcp_crawl4ai_rag_spark.operators.politeness import (
        apply_template_guard,
        template_explosion,
    )

    # a session-id mill (800 hex URLs, one family) + benign pages; ids
    # offset so every hex string carries a letter (digits-only ids would
    # correctly classify 'N' and split the family)
    mill = [(f"https://e.com/sess/{0xA0000000 + i:08x}/view",) for i in range(800)]
    ok = [(f"https://e.com/docs/page{i}",) for i in range(20)]
    other = [("https://e.com/about",)]
    df = spark.createDataFrame(mill + ok + other, "canonical_url string")
    fams = template_explosion(df, max_urls_per_template=100)
    rows = {r["template"]: r for r in fams.collect()}
    assert rows["e.com/sess/H/view"]["n_urls"] == 800
    assert rows["e.com/sess/H/view"]["exploded"] is True
    assert rows["e.com/docs/S"]["n_urls"] == 20
    assert rows["e.com/docs/S"]["exploded"] is False
    assert rows["e.com/about"]["exploded"] is False
    kept = apply_template_guard(df, fams).count()
    assert kept == 21  # the mill is gone, everything else survives


def test_template_explosion_plan_shape(spark):
    """One map-side-combinable groupBy over the template projection: the
    aggregate's partial runs before the exchange and no Python appears."""
    from mcp_crawl4ai_rag_spark.operators.politeness import template_explosion

    df = spark.range(0, 1000, 1, 4).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 7).cast("string"),
            F.lit(".example.com/p/"), F.col("id").cast("string"),
        ).alias("canonical_url")
    )
    plan = (
        template_explosion(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan  # map-side combine
    assert "Python" not in plan


EXOTIC_HOSTS = [
    "a.example.com", "b.example.com", "EXAMPLE.com", "example.com",
    "deep.sub.example.com", "x.co.uk", "y.x.co.uk", "z.y.x.co.uk",
    "single", "10.0.0.1", "user.github.io", "a.user.github.io",
    "shop.com.au", "b.shop.com.au", "blog.blogspot.com",
]


def test_registrable_domain_matches_twin(spark):
    from mcp_crawl4ai_rag_spark.functions.urls import (
        py_registrable_domain,
        registrable_domain,
    )

    df = spark.createDataFrame([(h,) for h in EXOTIC_HOSTS], "host string")
    rows = df.select("host", registrable_domain(F.col("host")).alias("d")).collect()
    for r in rows:
        assert r["d"] == py_registrable_domain(r["host"]), r["host"]


def test_registrable_domain_pinned():
    from mcp_crawl4ai_rag_spark.functions.urls import py_registrable_domain as rd

    assert rd("a.example.com") == "example.com"
    assert rd("EXAMPLE.com") == "example.com"
    assert rd("deep.sub.example.com") == "example.com"
    # multi-label suffixes keep three labels
    assert rd("y.x.co.uk") == "x.co.uk"
    assert rd("z.y.x.co.uk") == "x.co.uk"
    assert rd("x.co.uk") == "x.co.uk"
    assert rd("a.user.github.io") == "user.github.io"
    assert rd("b.shop.com.au") == "shop.com.au"
    # degenerate shapes return themselves
    assert rd("single") == "single"
    assert rd("10.0.0.1") == "10.0.0.1"
    assert rd("co.uk") == "co.uk"  # a bare suffix has no registrable part


def test_domain_grain_politeness_collapse(spark):
    """Mapping host -> registrable domain before the politeness layer makes
    all subdomains of one registered domain share a single budget row —
    the grain real crawlers throttle at."""
    from mcp_crawl4ai_rag_spark.functions.urls import registrable_domain
    from mcp_crawl4ai_rag_spark.operators.politeness import compute_budgets

    hosts = spark.createDataFrame(
        [(f"h{i}.example.com",) for i in range(10)] + [("y.x.co.uk",), ("x.co.uk",)],
        "host string",
    )
    domains = hosts.select(registrable_domain(F.col("host")).alias("host"))
    budgets = compute_budgets(domains.distinct(), None, None)
    rows = {r["host"]: r["budget"] for r in budgets.collect()}
    assert set(rows) == {"example.com", "x.co.uk"}


def test_property_new_kernels_total_and_domain_idempotent():
    """Totality of the new py twins over arbitrary URL-ish text, and
    eTLD+1 idempotence: the registrable domain of a registrable domain is
    itself."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mcp_crawl4ai_rag_spark.functions.urls import (
        py_is_crawl_trap,
        py_max_segment_run,
        py_registrable_domain,
        py_url_template,
    )

    urlish = st.text(alphabet="ab09./:?&=#-_", max_size=40)
    hostish = st.text(alphabet="ab09.-", min_size=1, max_size=30)

    @given(u=urlish)
    @settings(max_examples=400, deadline=None)
    def run_total(u):
        url = "https://" + u
        assert isinstance(py_is_crawl_trap(url), bool)
        assert py_max_segment_run(url) >= 0
        assert isinstance(py_url_template(url), str)

    @given(h=hostish)
    @settings(max_examples=400, deadline=None)
    def run_idem(h):
        d = py_registrable_domain(h)
        assert py_registrable_domain(d) == d

    run_total()
    run_idem()
