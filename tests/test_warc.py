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
        ("https://e.com/a", 200, "text/html; charset=utf-8", "utf-8", "<p>A</p>"),
        ("https://e.com/b", 404, "text/html; charset=utf-8", "utf-8", "<p>B</p>"),
    ]


def test_adversarial_body_not_delimiter_split():
    """A body containing WARC record-header bytes must NOT split the record
    — only Content-Length framing is authoritative."""
    evil = "WARC/1.0\r\nWARC-Type: response\r\n\r\nfake"
    blob = _resp("https://e.com/x", evil) + _resp("https://e.com/y", "ok")
    rows = py_parse_warc(blob)
    assert [(r[0], r[4]) for r in rows] == [
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
    assert [(r[0], r[4]) for r in rows] == [
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

    from mcp_crawl4ai_rag_spark.sources.corpus import (
        WARC_CHARSET_MOD,
        WARC_CHARSET_PLAN,
    )

    n = 120
    parsed = parse_warc(gen_warc_blobs(spark, n, records_per_blob=20))
    rows = {r["url"]: r for r in parsed.collect()}
    pages = gen_html_pages(spark, n).collect()
    assert len(rows) == n
    for p in pages:
        r = rows[p["url"]]
        pid = p["page_id"]
        if pid % WARC_404_MOD == 0:
            assert r["status"] == 404 and r["html"] == ""
        elif pid % WARC_CHARSET_MOD in WARC_CHARSET_PLAN:
            codec, _ct, meta, prefix = WARC_CHARSET_PLAN[pid % WARC_CHARSET_MOD]
            # decoded text is EXACTLY the planted page — mojibake-free —
            # and the sniffer reports the codec it used
            assert r["html"] == f"{meta}<p>{prefix}</p>" + p["raw_html"], codec
            want_cs = {"latin-1": "latin-1", "cp1251": "cp1251",
                       "shift_jis": "shift_jis", "utf-16": "utf-16"}[codec]
            assert r["charset"] == want_cs
        else:
            assert r["status"] == 200 and r["html"] == p["raw_html"]
            assert r["charset"] == "utf-8"


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

    from mcp_crawl4ai_rag_spark.sources.corpus import (
        WARC_CHARSET_MOD,
        WARC_CHARSET_PLAN,
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
    live = gen_html_pages(spark, n).where(F.col("page_id") % WARC_404_MOD != 0)
    direct = {
        r["url"]: (r["markdown"], r["page_id"])
        for r in extract_markdown(live, "raw_html", "markdown")
        .select("url", "page_id", "markdown")
        .collect()
    }
    assert len(via_warc) == len(direct)
    for r in via_warc:
        md, pid = direct[r["url"]]
        plan = WARC_CHARSET_PLAN.get(pid % WARC_CHARSET_MOD)
        if plan is not None:
            # the planted prefix paragraph lands DECODED before the page
            md = plan[3] + "\n\n" + md
        assert md == r["markdown"], r["url"]


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
        got = [(u, s, bod) for u, s, _ct, _cs, bod in py_parse_warc(blob)]
        assert got == want

    run()


def test_sniff_charset_precedence():
    """WHATWG sniff order: BOM beats transport header beats <meta>;
    unknown/malformed declarations fall through; utf-8 default."""
    from mcp_crawl4ai_rag_spark.sources.warc import sniff_charset

    # BOM wins even when the header lies
    assert sniff_charset("text/html; charset=utf-8", "﻿x".encode("utf-16")) == "utf-16"
    assert sniff_charset("text/html; charset=latin-1", b"\xef\xbb\xbfabc") == "utf-8-sig"
    # header charset, with aliasing
    assert sniff_charset("text/html; charset=ISO-8859-1", b"abc") == "latin-1"
    assert sniff_charset('text/html; charset="Shift_JIS"', b"abc") == "shift_jis"
    # header wins over meta
    assert (
        sniff_charset(
            "text/html; charset=windows-1251", b'<meta charset="utf-8">'
        )
        == "cp1251"
    )
    # meta fallback (plain header), both meta shapes
    assert sniff_charset("text/html", b'<meta charset="windows-1251"><p>') == "cp1251"
    assert (
        sniff_charset(
            "text/html",
            b'<meta http-equiv="Content-Type" content="text/html; charset=shift-jis">',
        )
        == "shift_jis"
    )
    # junk charset name -> fall through to meta, then default
    assert sniff_charset("text/html; charset=klingon-8", b"abc") == "utf-8"
    assert (
        sniff_charset("text/html; charset=klingon-8", b'<meta charset="latin1">')
        == "latin-1"
    )
    # meta outside the 2 KiB prescan window is ignored
    far = b" " * 4096 + b'<meta charset="windows-1251">'
    assert sniff_charset("text/html", far) == "utf-8"


def test_legacy_charset_bodies_decode_exactly():
    """Planted legacy-encoding responses decode mojibake-free through the
    full record parse; a BOM never leaks into the text."""
    from mcp_crawl4ai_rag_spark.sources.warc import py_parse_warc

    cases = [
        ("latin-1", "text/html; charset=ISO-8859-1", "Café naïve résumé"),
        ("cp1251", "text/html", '<meta charset="windows-1251"><p>Привет мир</p>'),
        ("shift_jis", "text/html; charset=Shift_JIS", "こんにちは世界"),
        ("utf-16", "text/html; charset=utf-8", "Ωμέγα δεδομένα"),  # BOM wins
    ]
    parts = []
    for k, (codec, ctype, text) in enumerate(cases):
        parts.append(
            render_warc_record(
                "response",
                f"https://e.com/c{k}",
                render_http_response(
                    text.encode(codec), status=200, content_type=ctype
                ),
                record_id=f"c{k}",
            )
        )
    rows = py_parse_warc(b"".join(parts))
    assert [(r[3], r[4]) for r in rows] == [
        ("latin-1", "Café naïve résumé"),
        ("cp1251", '<meta charset="windows-1251"><p>Привет мир</p>'),
        ("shift_jis", "こんにちは世界"),
        ("utf-16", "Ωμέγα δεδομένα"),  # BOM stripped by the codec
    ]
    assert not any("﻿" in r[4] or "\x00" in r[4] for r in rows)
