"""WARC source: the Common Crawl / web-archive ingestion format.

The reference never sees archived crawls — it always re-fetches live pages
through crawl4ai (src/crawl4ai_mcp.py:481-487,933-944). At 100-TB training
scale the dominant HTML source is NOT a live crawl but WARC archives
(Common Crawl publishes petabytes of them), so a Spark-native engine needs a
WARC reader as a first-class source. Format per ISO 28500 / the public WARC
1.0 spec: a WARC file is a sequence of records, each

    WARC/1.0\r\n
    <name>: <value>\r\n ...          (WARC-Type, WARC-Target-URI,
    \r\n                              Content-Length, ...)
    <block of exactly Content-Length bytes>
    \r\n\r\n

``response`` records carry an HTTP response (status line + headers + body)
as their block; ``warcinfo`` / ``request`` / ``metadata`` records are
skipped by an HTML pipeline. Common Crawl gzips records (member-per-record,
concatenated) — Python's gzip handles multi-member streams, so both
whole-blob and per-record compression parse through one decompress call.

Parsing is CONTENT-LENGTH FRAMED, never delimiter-scanned: an HTML body
containing the literal bytes ``WARC/1.0`` must not split a record, so the
parser walks header -> counted block -> separator. One Arrow-batched
``mapInPandas`` stage fans each blob out to its response rows — trivially
parallel over blobs (files), the same scaling shape as the sitemap source.
"""

from __future__ import annotations

import codecs
import gzip
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WARC_VERSION = "WARC/1.0"

PARSED_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("charset", StringType()),
        StructField("html", StringType()),
    ]
)

# --- Charset detection -----------------------------------------------------
# Common Crawl is full of legacy encodings (latin-1, windows-1251,
# shift-jis, ...); decoding every body as utf-8/replace silently feeds
# mojibake into the HTML→markdown kernel. The reference never faces this
# (crawl4ai's browser decodes before the reference sees text,
# src/crawl4ai_mcp.py:948) — an archive reader must do it itself.
# Precedence follows the WHATWG encoding sniff: BOM beats the transport
# header beats an in-document <meta charset>; utf-8 is the default. The
# BOM codecs (utf-8-sig / utf-16) strip the BOM on decode, so no
# ever reaches the markdown kernel.

_CHARSET_ALIASES = {
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "latin1": "latin-1",
    "windows-1251": "cp1251",
    "win-1251": "cp1251",
    "shift-jis": "shift_jis",
    "shift_jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "utf8": "utf-8",
}
_HDR_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,256}?charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", re.I
)
_META_SCAN_BYTES = 2048  # WHATWG prescan window


def _valid_codec(name: str | None) -> str | None:
    if not name:
        return None
    name = _CHARSET_ALIASES.get(name.lower(), name.lower())
    try:
        codecs.lookup(name)
        return name
    except LookupError:
        return None


def sniff_charset(content_type: str | None, body: bytes) -> str:
    """Codec for an HTTP HTML body: BOM → Content-Type ``charset=`` →
    ``<meta charset>`` prescan (first 2 KiB) → utf-8. Unknown or
    malformed declarations fall through to the next source."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"  # the codec dispatches LE/BE off the BOM
    m = _HDR_CHARSET_RE.search(content_type or "")
    enc = _valid_codec(m.group(1) if m else None)
    if enc:
        return enc
    m = _META_CHARSET_RE.search(body[:_META_SCAN_BYTES])
    enc = _valid_codec(m.group(1).decode("ascii", "replace") if m else None)
    return enc or "utf-8"


def decode_html_body(content_type: str | None, body: bytes) -> tuple[str, str]:
    """(decoded text, codec used) — sniff then decode with 'replace' so a
    lying declaration degrades per-character instead of failing the blob."""
    enc = sniff_charset(content_type, body)
    return body.decode(enc, "replace"), enc


def render_warc_record(
    rec_type: str,
    url: str | None,
    block: bytes,
    date: str = "2026-01-01T00:00:00Z",
    record_id: str = "rec-0",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """Render one WARC record (headers + counted block + separator)."""
    headers = [
        WARC_VERSION,
        f"WARC-Type: {rec_type}",
        f"WARC-Date: {date}",
        f"WARC-Record-ID: <urn:uuid:{record_id}>",
    ]
    if url is not None:
        headers.append(f"WARC-Target-URI: {url}")
    headers.append(f"Content-Type: {content_type}")
    headers.append(f"Content-Length: {len(block)}")
    head = ("\r\n".join(headers) + "\r\n\r\n").encode("utf-8")
    return head + block + b"\r\n\r\n"


def render_http_response(
    body: str | bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Render the HTTP response block a WARC ``response`` record carries.
    ``body`` may be pre-encoded bytes (legacy-charset archives — the
    Content-Type should then declare the matching ``charset=``)."""
    payload = body if isinstance(body, bytes) else body.encode("utf-8")
    reason = {200: "OK", 404: "Not Found", 429: "Too Many Requests"}.get(
        status, "Unknown"
    )
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    return head + payload


def py_parse_warc(blob: bytes) -> list[tuple[str, int, str, str, str]]:
    """Parse one WARC blob into its ``response`` records.

    Returns ``(url, status, content_type, charset, body)`` tuples in file
    order; non-response records (warcinfo/request/metadata) are consumed
    and skipped. Strictly framed by Content-Length; raises ``ValueError``
    on a record whose header is malformed or whose block is truncated, so
    a corrupt archive fails loudly instead of yielding silently-clipped
    documents. Bodies decode CHARSET-CORRECTLY (:func:`sniff_charset`:
    BOM → header → meta → utf-8); HTTP header lines decode as latin-1
    (RFC 9110 field encoding — lossless for any byte)."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)  # handles concatenated members too
    out: list[tuple[str, int, str, str, str]] = []
    pos = 0
    n = len(blob)
    while pos < n:
        while blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("WARC record header not terminated")
        lines = blob[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {lines[0]!r}")
        fields = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record missing Content-Length") from exc
        block_start = hdr_end + 4
        if block_start + clen > n:
            raise ValueError("WARC record block truncated")
        block = blob[block_start : block_start + clen]
        pos = block_start + clen
        if fields.get("warc-type") != "response":
            continue
        http_end = block.find(b"\r\n\r\n")
        if http_end < 0:
            raise ValueError("HTTP response block not terminated")
        http_lines = block[:http_end].decode("latin-1").split("\r\n")
        parts = http_lines[0].split(None, 2)
        if len(parts) < 2 or not parts[0].startswith("HTTP/"):
            raise ValueError(f"bad HTTP status line: {http_lines[0]!r}")
        status = int(parts[1])
        ctype = ""
        for ln in http_lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                if k.strip().lower() == "content-type":
                    ctype = v.strip()
        body, charset = decode_html_body(ctype, block[http_end + 4 :])
        out.append((fields.get("warc-target-uri", ""), status, ctype, charset, body))
    return out


def parse_warc(
    df: DataFrame, file_col: str = "warc_file", data_col: str = "data"
) -> DataFrame:
    """Fan each WARC blob out to its response rows — one Arrow-batched
    ``mapInPandas`` stage, trivially parallel over blobs; no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            files, urls, statuses, ctypes, charsets, htmls = [], [], [], [], [], []
            for fname, blob in zip(pdf[file_col], pdf[data_col]):
                for url, status, ctype, charset, body in py_parse_warc(bytes(blob)):
                    files.append(fname)
                    urls.append(url)
                    statuses.append(status)
                    ctypes.append(ctype)
                    charsets.append(charset)
                    htmls.append(body)
            yield pd.DataFrame(
                {
                    "warc_file": files,
                    "url": urls,
                    "status": pd.Series(statuses, dtype="int32"),
                    "content_type": ctypes,
                    "charset": charsets,
                    "html": htmls,
                }
            )

    return df.select(file_col, data_col).mapInPandas(gen, PARSED_SCHEMA)
