"""Markdown-aware document chunker.

Reproduces the observable behavior of the reference's greedy splitter
``smart_chunk_markdown`` (src/crawl4ai_mcp.py:231-329): sequential cursor,
target window ``chunk_size``; inside an open ``` code fence the window is
extended to the closing fence; otherwise the window is shortened to the last
code-fence boundary / paragraph break / sentence break, each accepted only
past 30% of chunk_size; chunks are stripped; empty chunks dropped; an
iteration guard caps pathological inputs.

Chunking one document is inherently sequential, so it runs as an
Arrow-batched pandas UDF ``string -> array<string>`` followed by
``posexplode`` — per-document Python, vectorized transfer, scales with
partitions (one document never spans partitions).

Per-chunk section metadata follows reference extract_section_info
(src/crawl4ai_mcp.py:331-348) as pure column expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..config import DEFAULT_CHUNK_SIZE, MIN_BREAK_FRACTION

# ---------------------------------------------------------------------------
# Pure-Python kernel (unit-testable; also the differential oracle surface)
# ---------------------------------------------------------------------------


def _window_end(text: str, start: int, size: int) -> int:
    """Pick the end offset for the chunk starting at ``start``.

    Mirrors the reference's break-point preferences exactly
    (src/crawl4ai_mcp.py:276-310), including its quirks:
    - fence parity is computed over ``text[:end]`` globally;
    - when the window's last fence is an *opening* fence, it first looks for
      the previous fence, then a paragraph break before the opening fence;
    - paragraph/sentence breaks only count past MIN_BREAK_FRACTION of size.
    """
    end = start + size
    window = text[start:end]
    min_break = size * MIN_BREAK_FRACTION

    if text.count("```", 0, end) % 2 == 1:
        # Cursor sits inside an open code fence: extend to the closing fence.
        closing = text.find("```", end)
        if closing != -1:
            return closing + 3
        return end

    fence = window.rfind("```")
    if fence != -1 and fence > min_break:
        if window.count("```", 0, fence) % 2 == 0:
            # Last fence in window opens a block: don't break there. Prefer
            # the previous fence, else a paragraph break before it.
            prev = window.rfind("```", 0, fence)
            if prev != -1 and prev > min_break:
                return start + prev + 3
            para = window.rfind("\n\n", 0, fence)
            if "\n\n" in window[:fence] and para > min_break:
                return start + para
            return end
        return start + fence + 3  # closing fence: break right after it

    para = window.rfind("\n\n")
    if para != -1:
        if para > min_break:
            return start + para
        return end

    period = window.rfind(". ")
    if period != -1 and period > min_break:
        return start + period + 1
    return end


def chunk_markdown(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE) -> list[str]:
    """Split ``text`` into chunks; output byte-identical to the reference
    splitter for every input (property-tested in tests/test_chunking.py)."""
    if chunk_size <= 0:
        raise ValueError(f"Invalid chunk_size: {chunk_size}")
    if not text:
        return []

    out: list[str] = []
    start = 0
    n = len(text)
    max_iter = n // 100 + 1000  # same pathological-input guard as reference

    for _ in range(max_iter):
        if start >= n:
            break
        if start + chunk_size >= n:
            out.append(text[start:].strip())
            break
        end = _window_end(text, start, chunk_size)
        piece = text[start:end].strip()
        if piece:
            out.append(piece)
        start = end
    else:
        if start < n:
            out.append(text[start:].strip())
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def chunk_udf(chunk_size: int = DEFAULT_CHUNK_SIZE):
    """Arrow-batched ``string -> array<string>`` chunker UDF."""

    @F.pandas_udf(ArrayType(StringType()))
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: chunk_markdown(t, chunk_size) if t else [])

    return _chunk


def explode_chunks(
    df: DataFrame,
    text_col: str = "markdown",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> DataFrame:
    """``(…, text)`` → one row per chunk: ``(…, chunk_number, content)``.

    Drops empty-text rows first so the UDF never sees nulls; keeps every
    other input column. chunk_number is 0-based per document, matching the
    reference's enumerate() (src/crawl4ai_mcp.py:390-391).
    """
    chunker = chunk_udf(chunk_size)
    return (
        df.where(F.col(text_col).isNotNull() & (F.col(text_col) != ""))
        .withColumn("__chunks", chunker(F.col(text_col)))
        .select(
            *[c for c in df.columns if c != text_col],
            F.posexplode("__chunks").alias("chunk_number", "content"),
        )
    )


def headers_expr(content: Column | str) -> Column:
    """'; '-joined markdown headers of a chunk — reference
    extract_section_info regex ``^(#+)\\s+(.+)$`` multiline then
    ``'; '.join(f'{hashes} {title}')`` (src/crawl4ai_mcp.py:341-342)."""
    c = F.col(content) if isinstance(content, str) else content
    # Extract full header lines, then normalize "##   Title" → "## Title".
    lines = F.regexp_extract_all(c, F.lit(r"(?m)^(#+[ \t]+.+)$"), 1)
    normalized = F.transform(
        lines, lambda s: F.regexp_replace(s, r"^(#+)[ \t]+", r"$1 ")
    )
    return F.array_join(normalized, "; ")


def char_count_expr(content: Column | str) -> Column:
    c = F.col(content) if isinstance(content, str) else content
    return F.length(c)


def word_count_expr(content: Column | str) -> Column:
    """len(chunk.split()) — whitespace-run tokenization, no empty tokens."""
    c = F.col(content) if isinstance(content, str) else content
    return F.size(F.regexp_extract_all(c, F.lit(r"\S+"), 0))


def with_section_info(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Adds headers / char_count / word_count columns (reference
    extract_section_info, src/crawl4ai_mcp.py:331-348)."""
    c = F.col(content_col)
    return (
        df.withColumn("headers", headers_expr(c))
        .withColumn("char_count", char_count_expr(c))
        .withColumn("word_count", word_count_expr(c))
    )
