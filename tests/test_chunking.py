"""Chunker differential + property tests.

``_oracle`` below is a compact transcription of the reference splitter's
control flow (src/crawl4ai_mcp.py:231-329) used purely as a test oracle;
the engine implementation in functions/chunking.py is independently
structured and must match it byte-for-byte on every input.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions.chunking import (
    chunk_markdown,
    explode_chunks,
    headers_expr,
    with_section_info,
)


def _oracle(text, chunk_size=5000):
    if chunk_size <= 0:
        raise ValueError
    if not text:
        return []
    chunks, start, n = [], 0, len(text)
    max_iterations = n // 100 + 1000
    iteration = 0
    while start < n:
        end = start + chunk_size
        if end >= n:
            chunks.append(text[start:].strip())
            break
        chunk = text[start:end]
        if text[:end].count("```") % 2 == 1:
            cb = text.find("```", end)
            if cb != -1:
                end = cb + 3
        else:
            code_block = chunk.rfind("```")
            if code_block != -1 and code_block > chunk_size * 0.3:
                if chunk[:code_block].count("```") % 2 == 0:
                    prev = chunk[:code_block].rfind("```")
                    if prev != -1 and prev > chunk_size * 0.3:
                        end = start + prev + 3
                    elif "\n\n" in chunk[:code_block]:
                        lb = chunk[:code_block].rfind("\n\n")
                        if lb > chunk_size * 0.3:
                            end = start + lb
                else:
                    end = start + code_block + 3
            elif "\n\n" in chunk:
                lb = chunk.rfind("\n\n")
                if lb > chunk_size * 0.3:
                    end = start + lb
            elif ". " in chunk:
                lp = chunk.rfind(". ")
                if lp > chunk_size * 0.3:
                    end = start + lp + 1
        piece = text[start:end].strip()
        if piece:
            chunks.append(piece)
        start = end
        iteration += 1
        if iteration > max_iterations:
            if start < n:
                chunks.append(text[start:].strip())
            break
    return chunks


CASES = [
    ("", 100),
    ("short", 100),
    ("a" * 250, 100),
    ("para one\n\npara two\n\npara three " + "x" * 200, 100),
    ("sentence one. sentence two. sentence three. " * 10, 100),
    ("pre\n```\ncode " + "y" * 150 + "\n```\npost " + "z" * 100, 100),
    ("```\nopen fence never closed " + "q" * 300, 100),
    ("a\n\nb", 100),
    ("x. y", 100),
    ("```a``` ```b``` ```c``` " + "w" * 200, 100),
    ("\n\n" * 100, 50),
    ("spaces   \n\n   " + "m" * 120, 60),
    ("# H1\n\ntext\n\n## H2\n\nmore " + "t" * 300, 120),
]


@pytest.mark.parametrize("text,size", CASES)
def test_chunker_matches_oracle(text, size):
    assert chunk_markdown(text, size) == _oracle(text, size)


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab`. \n#", min_size=0, max_size=600),
    st.integers(min_value=1, max_value=200),
)
def test_chunker_matches_oracle_fuzz(text, size):
    assert chunk_markdown(text, size) == _oracle(text, size)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc .\n", min_size=1, max_size=500))
def test_chunker_coverage_property(text):
    """Concatenated chunks ≈ original modulo whitespace stripping: no
    content characters are lost."""
    joined = "".join(chunk_markdown(text, 50))
    assert joined.replace(" ", "").replace("\n", "") == text.replace(" ", "").replace(
        "\n", ""
    )


def test_chunker_invalid_size():
    with pytest.raises(ValueError):
        chunk_markdown("x", 0)


def test_explode_chunks_spark(spark):
    rows = [(i, CASES[i][0]) for i in range(len(CASES)) if CASES[i][0]]
    df = spark.createDataFrame(rows, "doc_id int, markdown string")
    out = explode_chunks(df, "markdown", chunk_size=100).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_number"], r["content"]))
    for doc_id, text in rows:
        got = [c for _, c in sorted(by_doc.get(doc_id, []))]
        assert got == _oracle(text, 100), f"doc {doc_id}"


def test_headers_expr(spark):
    text = "# Top\n\nbody\n\n## Sub Section\n\nmore\n### x\nno#t a header"
    df = spark.createDataFrame([(text,)], "content string")
    got = df.select(headers_expr("content")).collect()[0][0]
    assert got == "# Top; ## Sub Section; ### x"


def test_section_info_counts(spark):
    text = "## H\n\nhello  world foo"
    df = spark.createDataFrame([(text,)], "content string")
    r = with_section_info(df).collect()[0]
    assert r["char_count"] == len(text)
    assert r["word_count"] == len(text.split())
