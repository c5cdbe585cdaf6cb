"""WARC source: framing parser + deterministic archive corpus.

The law is the public WARC/1.0 format (ISO 28500): content-length framing,
typed records, HTTP response blocks. The reference has no archive path at
all (it always live-fetches, src/crawl4ai_mcp.py:481-487); these tests pin
our reader against hand-built records, adversarial bodies, gzip, and the
closed-form gen_warc_blobs corpus.
"""

import gzip

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.sources.warc import (
    parse_warc,
    py_parse_warc,
    render_http_response,
    render_warc_record,
)


def _resp(url, body, status=200, rid="r"):
    return render_warc_record(
        "response", url, render_http_response(body, status=status), record_id=rid
    )


def test_roundtrip_and_skips():
    blob = (
        render_warc_record(
            "warcinfo", None, b"software: x\r\n", content_type="application/warc-fields"
        )
        + _resp("https://e.com/a", "<p>A</p>", 200, "a")
        + render_warc_record(
            "request",
            "https://e.com/b",
            b"GET /b HTTP/1.1\r\n\r\n",
            content_type="application/http; msgtype=request",
        )
        + _resp("https://e.com/b", "<p>B</p>", 404, "b")
    )
    rows = py_parse_warc(blob)
    assert rows == [
        ("https://e.com/a", 200, "text/html; charset=utf-8", "<p>A</p>"),
        ("https://e.com/b", 404, "text/html; charset=utf-8", "<p>B</p>"),
    ]


def test_adversarial_body_not_delimiter_split():
    """A body containing WARC record-header bytes must NOT split the record
    — only Content-Length framing is authoritative."""
    evil = "WARC/1.0\r\nWARC-Type: response\r\n\r\nfake"
    blob = _resp("https://e.com/x", evil) + _resp("https://e.com/y", "ok")
    rows = py_parse_warc(blob)
    assert [(r[0], r[3]) for r in rows] == [
        ("https://e.com/x", evil),
        ("https://e.com/y", "ok"),
    ]


def test_gzip_whole_and_member_per_record():
    a = _resp("https://e.com/a", "<p>A</p>")
    b = _resp("https://e.com/b", "<p>B</p>")
    plain = py_parse_warc(a + b)
    assert py_parse_warc(gzip.compress(a + b, mtime=0)) == plain
    # Common Crawl shape: one gzip member per record, concatenated
    members = gzip.compress(a, mtime=0) + gzip.compress(b, mtime=0)
    assert py_parse_warc(members) == plain


def test_malformed_raises():
    good = _resp("https://e.com/a", "<p>A</p>")
    with pytest.raises(ValueError):
        py_parse_warc(good[: len(good) - 20])  # truncated block
    with pytest.raises(ValueError):
        py_parse_warc(b"NOT-A-WARC\r\n\r\n")
    no_len = (
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"  # header ends, no length
    )
    with pytest.raises(ValueError):
        py_parse_warc(no_len)


def test_multibyte_body_framing():
    """Content-Length counts BYTES; a multi-byte UTF-8 body must frame
    exactly."""
    body = "café — français"
    blob = _resp("https://e.com/u", body) + _resp("https://e.com/v", "tail")
    rows = py_parse_warc(blob)
    assert [(r[0], r[3]) for r in rows] == [
        ("https://e.com/u", body),
        ("https://e.com/v", "tail"),
    ]


def test_gen_warc_blobs_matches_html_corpus(spark):
    """Archive -> parse recovers exactly the gen_html_pages corpus: every
    page one response row, 404 bodies empty, 200 bodies byte-identical to
    the closed-form raw HTML."""
    from mcp_crawl4ai_rag_spark.sources.corpus import (
        WARC_404_MOD,
        gen_html_pages,
        gen_warc_blobs,
    )

    n = 120
    parsed = parse_warc(gen_warc_blobs(spark, n, records_per_blob=20))
    rows = {r["url"]: r for r in parsed.collect()}
    pages = gen_html_pages(spark, n).collect()
    assert len(rows) == n
    for p in pages:
        r = rows[p["url"]]
        if p["page_id"] % WARC_404_MOD == 0:
            assert r["status"] == 404 and r["html"] == ""
        else:
            assert r["status"] == 200 and r["html"] == p["raw_html"]


def test_gen_warc_gzip_blobs_present(spark):
    from mcp_crawl4ai_rag_spark.sources.corpus import WARC_GZ_MOD, gen_warc_blobs

    blobs = gen_warc_blobs(spark, 100, records_per_blob=20).collect()
    gz = {b["warc_file"] for b in blobs if b["warc_file"].endswith(".gz")}
    assert len(blobs) == 5
    assert gz == {
        f"crawl-{i:06d}.warc.gz" for i in range(5) if i % WARC_GZ_MOD == 0
    }
    for b in blobs:
        if b["warc_file"].endswith(".gz"):
            assert bytes(b["data"])[:2] == b"\x1f\x8b"


def test_warc_to_markdown_composition(spark):
    """The Common Crawl pipeline: WARC bytes -> parse -> HTML->markdown
    equals extraction straight off the HTML corpus."""
    from mcp_crawl4ai_rag_spark.functions.html import extract_markdown
    from mcp_crawl4ai_rag_spark.sources.corpus import (
        WARC_404_MOD,
        gen_html_pages,
        gen_warc_blobs,
    )

    n = 80
    via_warc = (
        extract_markdown(
            parse_warc(gen_warc_blobs(spark, n)).where(F.col("status") == 200),
            "html",
            "markdown",
        )
        .select("url", "markdown")
        .collect()
    )
    direct = {
        r["url"]: r["markdown"]
        for r in extract_markdown(gen_html_pages(spark, n), "raw_html", "markdown")
        .join(
            gen_html_pages(spark, n).where(
                F.col("page_id") % WARC_404_MOD != 0
            ).select("url"),
            "url",
            "left_semi",
        )
        .select("url", "markdown")
        .collect()
    }
    assert len(via_warc) == len(direct)
    for r in via_warc:
        assert direct[r["url"]] == r["markdown"]


def test_property_warc_roundtrip_arbitrary_bodies():
    """Render -> parse is the identity on response records for arbitrary
    bodies (including CRLF runs, WARC-header lookalikes, unicode), with
    noise records interleaved and optional gzip."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    body = st.text(
        alphabet=st.sampled_from(list("abc\r\n:/ WARC10é€")), max_size=60
    )
    cases = st.lists(
        st.tuples(body, st.sampled_from([200, 404, 429]), st.booleans()),
        min_size=0,
        max_size=6,
    )

    @given(cases=cases, gz=st.booleans())
    @settings(max_examples=200, deadline=None)
    def run(cases, gz):
        parts = []
        want = []
        for k, (b, status, with_req) in enumerate(cases):
            url = f"https://e.com/p{k}"
            if with_req:
                parts.append(
                    render_warc_record(
                        "request",
                        url,
                        b"GET / HTTP/1.1\r\n\r\n",
                        content_type="application/http; msgtype=request",
                    )
                )
            parts.append(
                render_warc_record(
                    "response", url, render_http_response(b, status=status),
                    record_id=f"r{k}",
                )
            )
            want.append((url, status, b))
        blob = b"".join(parts)
        if gz:
            blob = gzip.compress(blob, mtime=0)
        got = [(u, s, bod) for u, s, _ct, bod in py_parse_warc(blob)]
        assert got == want

    run()
