"""HTML→markdown extraction (functions/html.py).

The reference consumes crawl4ai's DefaultMarkdownGenerator output
(src/crawl4ai_mcp.py:948,1016); this engine converts itself. The kernel is
pinned on hand-written HTML (independent of the corpus renderer), then the
Spark surface and the composed extract→chunk path are exercised.
"""

import pyspark.sql.functions as F
import pytest

from mcp_crawl4ai_rag_spark.functions.html import html_to_markdown


@pytest.mark.parametrize(
    "html,md",
    [
        ("<h1>Title</h1>", "# Title"),
        ("<h3 class='x'>Deep</h3>", "### Deep"),
        ("<p>one</p><p>two</p>", "one\n\ntwo"),
        ("<p>Fish &amp; chips &lt;t&gt; &quot;q&quot; &#39;a&#39;</p>", 'Fish & chips <t> "q" \'a\''),
        ("<p>a&nbsp;b</p>", "a b"),
        ('<a href="https://x.example/y">link</a>', "[link](https://x.example/y)"),
        ("<a href='https://x.example/z'>sq</a>", "[sq](https://x.example/z)"),
        ('<img src="https://x/i.png" alt="pic"/>', "![pic](https://x/i.png)"),
        ('<img alt="a" src="s.png">', "![a](s.png)"),
        ("<ul><li>a</li><li>b</li></ul>", "- a\n- b"),
        ("<pre><code>x &lt; y\n  keep  spaces</code></pre>", "```\nx < y\n  keep  spaces\n```"),
        ("<div>line1<br>line2</div>", "line1\nline2"),
        ("<p>keep</p><script>drop()</script><style>p{}</style><!-- gone -->", "keep"),
        ("<html><head><title>T</title></head><body><p>b</p></body></html>", "b"),
        ("<p>a  b\tc</p>", "a b c"),  # whitespace collapse outside fences
        ("", ""),
        ("plain text no tags", "plain text no tags"),
        ("<p><b>bold</b> and <em>em</em> stripped to text</p>", "bold and em stripped to text"),
    ],
)
def test_html_to_markdown_cases(html, md):
    assert html_to_markdown(html) == md


def test_html_none_and_nested_blocks():
    assert html_to_markdown(None) == ""
    got = html_to_markdown(
        "<div><h2>S</h2><p>para</p><ul><li>i1</li></ul></div>"
    )
    assert got == "## S\n\npara\n\n- i1"


def test_extract_markdown_spark_matches_kernel(spark):
    from mcp_crawl4ai_rag_spark.functions.html import extract_markdown
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_html_pages

    pages = gen_html_pages(spark, 40, partitions=4)
    rows = extract_markdown(pages).select("url", "raw_html", "markdown").collect()
    assert len(rows) == 40
    for r in rows:
        assert r["markdown"] == html_to_markdown(r["raw_html"])
        # structural invariants of the rendered page
        assert r["markdown"].startswith("# Page ")
        assert "```\ncode block line " in r["markdown"]
        assert "<" not in r["markdown"].replace("<-", "")  # no tags survive
        assert "&amp;" not in r["markdown"]


def test_extract_then_chunk_composes(spark):
    """The extracted markdown feeds the existing chunker unchanged: fences
    and paragraph breaks steer chunk boundaries exactly as chunk_markdown
    defines them (differential vs the pure-Python path)."""
    from mcp_crawl4ai_rag_spark.functions.chunking import (
        chunk_markdown,
        explode_chunks,
    )
    from mcp_crawl4ai_rag_spark.functions.html import extract_markdown
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_html_pages

    md = extract_markdown(gen_html_pages(spark, 25, partitions=4))
    got = {}
    for r in (
        explode_chunks(md.select("url", "markdown"), "markdown", chunk_size=120)
        .select("url", "chunk_number", "content")
        .collect()
    ):
        got.setdefault(r["url"], []).append((r["chunk_number"], r["content"]))
    src = {r["url"]: r["markdown"] for r in md.select("url", "markdown").collect()}
    assert set(got) == set(src)
    for url, pieces in got.items():
        pieces = [c for _, c in sorted(pieces)]
        assert pieces == chunk_markdown(src[url], 120)
        assert len(pieces) > 1  # 120-char windows split the synthetic page


def test_extraction_plan_is_single_stage(spark):
    """Scale shape: extraction is one Arrow projection — no Exchange in the
    plan (stateless, embarrassingly parallel at 100 TB)."""
    from mcp_crawl4ai_rag_spark.functions.html import extract_markdown
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_html_pages

    plan = (
        extract_markdown(gen_html_pages(spark, 10))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_html_to_markdown_properties():
    """Kernel totality under adversarial input: arbitrary text — including
    NUL bytes, stray angle brackets, half-open tags, and fence-placeholder
    shaped bytes (\\x001\\x00) — must never raise, never leak a NUL or a
    fence placeholder into the output, and must keep <script>/<style>
    payloads out. An Arrow batch dies whole if one cell throws, so
    totality IS the scale property here."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tag_soup = st.sampled_from(
        ["<", ">", "</p", "<pre>", "</pre>", "<a href='", "\x00", "\x001\x00",
         "&amp;", "&nbsp;", "<!--", "-->", "<script>", "</script>", "x", " ", "\n"]
    )
    docs = st.lists(tag_soup, max_size=40).map("".join) | st.text(max_size=200)

    @settings(max_examples=300, deadline=None)
    @given(docs)
    def check(doc):
        out = html_to_markdown(doc)
        assert isinstance(out, str)
        assert "\x00" not in out                    # placeholders never leak
        assert "<script>" not in out.lower()
        assert "<style>" not in out.lower()

    check()


def test_html_script_payload_never_survives():
    """The DROP rule must win even when the payload contains markup-ish
    text that later rules would otherwise rewrite."""
    out = html_to_markdown(
        "<p>keep</p><script>var s = '<h1>inject</h1>';</script>"
        "<style>p::before { content: '<li>'; }</style>"
    )
    assert out == "keep"
    assert "inject" not in out


def test_extraction_quality_harness_exact_and_detects_regressions(spark):
    """The planted-truth extraction-quality harness (r5): main recall is
    exactly 2/2 at both stages, text boilerplate survives extraction
    (4/7) and dies in the strip (0/7) — and the harness actually DETECTS
    a broken strip (disabled threshold -> boilerplate survives)."""
    from mcp_crawl4ai_rag_spark.functions.html import extract_markdown
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import strip_boilerplate
    from mcp_crawl4ai_rag_spark.sources.corpus import (
        BOILER_CODE_MARKERS,
        BOILER_MAIN_MARKERS,
        BOILER_TEXT_MARKERS,
        N_BOILER_HOSTS,
        gen_boiler_html_pages,
    )

    n = 60
    pages = gen_boiler_html_pages(spark, n)
    md = extract_markdown(pages, "raw_html", "markdown")
    rows = md.select("page_id", "markdown").collect()
    assert len(rows) == n
    for r in rows:
        i, h = r["page_id"], r["page_id"] % N_BOILER_HOSTS
        text = r["markdown"]
        for m in BOILER_MAIN_MARKERS:
            assert m.format(i=i) in text
        for m in BOILER_TEXT_MARKERS:
            assert m.format(h=h) in text  # real text: extractor keeps it
        for m in BOILER_CODE_MARKERS:
            assert m.format(h=h) not in text  # script/comment/onclick die

    clean = strip_boilerplate(
        md.select("url", "host", "markdown"),
        id_col="url", host_col="host", text_col="markdown",
    )
    crows = clean.collect()
    assert all(r["n_removed"] > 0 for r in crows)
    for r in crows:
        h = int(r["host"][1])
        for m in BOILER_TEXT_MARKERS + BOILER_CODE_MARKERS:
            assert m.format(h=h) not in r["clean"]
        # main survives: url ends with the page id
        i = int(r["url"].rsplit("/", 1)[1])
        for m in BOILER_MAIN_MARKERS:
            assert m.format(i=i) in r["clean"]

    # regression detectability: a strip that never fires leaves the text
    # boilerplate in place -> the harness counts jump from 0 to 4
    broken = strip_boilerplate(
        md.select("url", "host", "markdown"),
        min_host_pages=10**9,
        id_col="url", host_col="host", text_col="markdown",
    ).limit(5).collect()
    for r in broken:
        h = int(r["host"][1])
        assert any(m.format(h=h) in r["clean"] for m in BOILER_TEXT_MARKERS)
