"""Embedding surface.

The reference embeds chunk batches via the OpenAI API (src/utils.py:148-202,
batch ≤20, dim 1536, token-truncated to 8191). This sandbox has no network,
so the engine ships a *deterministic local embedder*: seeded BLAKE2b of the
text → PCG64 stream → N(0,1) vector → L2 normalize. It is a drop-in stand-in
with the same dataflow shape (Arrow-batched mapInPandas stage, bounded batch
size); swapping in a real API client touches only ``_embed_batch``.

Truncation reproduces the reference's two guards:
- MAX_DOCUMENT_LENGTH char cap (src/utils.py:258-259)
- token cap — the reference uses tiktoken (≤8191 tokens, src/utils.py:
  167-185); tiktoken is not installed here, so the stand-in caps on the same
  regex token stream used by functions/text.py (documented deviation).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from ..config import EMBEDDING_DIM, MAX_DOCUMENT_LENGTH, QUERY_CONTEXT_PREFIX

MAX_EMBED_TOKENS = 8191  # reference src/utils.py:167


def embed_text(text: str, dim: int = EMBEDDING_DIM) -> np.ndarray:
    """Deterministic unit vector for ``text`` (float32)."""
    digest = hashlib.blake2b(text.encode("utf-8"), digest_size=16).digest()
    seed = int.from_bytes(digest, "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    v = rng.standard_normal(dim).astype(np.float32)
    norm = float(np.linalg.norm(v))
    return v / norm if norm > 0 else v


def _embed_batch(texts: list[str], dim: int) -> list[list[float]]:
    # Swap point for a real embedding API; retry/classify logic would live
    # here (reference exponential backoff, src/utils.py:78-131).
    return [embed_text(t, dim).tolist() for t in texts]


def embed_udf(dim: int = EMBEDDING_DIM):
    """Arrow-batched ``string -> array<float>`` embedding UDF."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        clipped = texts.fillna("").str.slice(0, MAX_DOCUMENT_LENGTH)
        return pd.Series(_embed_batch(clipped.tolist(), dim))

    return _embed


def with_embeddings(
    df: DataFrame,
    text_col: str = "content",
    out_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    return df.withColumn(out_col, embed_udf(dim)(F.col(text_col)))


def embed_texts_mapinpandas(
    df: DataFrame,
    text_col: str = "content",
    out_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """mapInPandas variant — the shape a remote-API embedder needs (one
    client per partition, batched requests; reference EMBEDDING_BATCH_SIZE
    twins ``spark.sql.execution.arrow.maxRecordsPerBatch``)."""
    schema_out = df.schema.add(out_col, ArrayType(FloatType()))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").str.slice(0, MAX_DOCUMENT_LENGTH)
            pdf[out_col] = _embed_batch(texts.tolist(), dim)
            yield pdf

    return df.mapInPandas(gen, schema=schema_out)


def embed_query(query: str, contextual: bool = False, dim: int = EMBEDDING_DIM) -> list[float]:
    """Query-side embedding; when ``contextual`` the reference prepends a
    search prompt (src/utils.py:552-561)."""
    text = (QUERY_CONTEXT_PREFIX + query) if contextual else query
    return embed_text(text[:MAX_DOCUMENT_LENGTH], dim).tolist()
