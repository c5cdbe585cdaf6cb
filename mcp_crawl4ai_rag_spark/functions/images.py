"""Multimodal (image) payload kernels.

The corpus is an Iceberg/parquet table of image+caption pairs with a
``bytes: binary`` payload (BASELINE.json input_hint). The reference crawler
treats images purely as *binary URLs to skip* (src/crawl4ai_mcp.py:131-144);
in this engine they are first-class payloads with per-row invariants:
decoded-pixel PSNR ≥ 40 dB for lossy ``fmt``, bit-exact for lossless,
``caption`` strict equality, ``phash`` recompute match.

CODEC STUB NOTE: PIL/libjpeg are not installed in this container, so the
codec below is a *deterministic fake*: 'png' = zlib of raw grayscale pixels
(lossless), 'jpeg' = 4-level quantization then zlib (lossy, PSNR ≈ 46 dB).
The Spark-side plumbing — binary schema, Arrow-batched mapInPandas decode,
batch shapes, partitioning — is real and tested; swapping in PIL touches only
``encode_image`` / ``decode_image``.

All Spark entry points are ``mapInPandas`` stages: one numpy pipeline per
Arrow batch, no per-row Python at the DataFrame boundary.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = b"SGIM"  # fake-codec container magic
_JPEG_Q = 4  # quantization step → max abs error 2 → PSNR ~46 dB


def _seed_for(image_id: str) -> int:
    d = hashlib.blake2b(image_id.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big")


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic grayscale pixels: an 8×8 coarse pattern upscaled to
    (h, w) — structured enough to compress and to carry a meaningful phash."""
    rng = np.random.Generator(np.random.PCG64(_seed_for(image_id)))
    coarse = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    img = np.kron(coarse, np.ones((max(h // 8, 1), max(w // 8, 1)), dtype=np.uint8))
    return img[:h, :w]


_CAPTION_VOCAB = (
    "a the red blue green small large photo image picture of cat dog tree "
    "house car mountain river sky night day person building bridge flower"
).split()


def gen_caption(image_id: str) -> str:
    rng = np.random.Generator(np.random.PCG64(_seed_for(image_id) ^ 0xC0FFEE))
    n = int(rng.integers(4, 12))
    return " ".join(_CAPTION_VOCAB[i] for i in rng.integers(0, len(_CAPTION_VOCAB), n))


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Container: MAGIC | fmt(1B: 0=png,1=jpeg) | w,h (uint16 LE) | zlib(payload)."""
    h, w = pixels.shape
    if fmt == "jpeg":
        payload = ((pixels // _JPEG_Q) * _JPEG_Q + _JPEG_Q // 2).astype(np.uint8)
        code = 1
    elif fmt == "png":
        payload = pixels
        code = 0
    else:
        raise NotImplementedError(f"codec stub supports png/jpeg, got {fmt!r}")
    return _MAGIC + struct.pack("<BHH", code, w, h) + zlib.compress(payload.tobytes(), 6)


def decode_image(blob: bytes) -> tuple[str, np.ndarray]:
    if blob[:4] != _MAGIC:
        raise ValueError("not a fake-codec image")
    code, w, h = struct.unpack("<BHH", blob[4:9])
    raw = zlib.decompress(blob[9:])
    return ("jpeg" if code == 1 else "png"), np.frombuffer(raw, dtype=np.uint8).reshape(h, w)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """Average-hash: 8×8 block means vs global mean → 64 bits (signed)."""
    h, w = pixels.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = pixels[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return int(np.uint64(v).astype(np.int64))


def resize_pixels(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — deterministic, numpy-only (the PIL-backed
    bilinear path swaps in here when the real codec lands)."""
    h, w = pixels.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys[:, None], xs[None, :]]


RESIZED_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Batch image resize: decode → nearest-neighbor resample → re-encode,
    one numpy pipeline per Arrow batch (mapInPandas; no per-row Python at
    the DataFrame boundary). Output keeps the corpus payload shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                _, px = decode_image(bytes(blob))
                out = resize_pixels(px, out_w, out_h)
                rows.append((iid, encode_image(out, fmt), out_w, out_h, fmt))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema=RESIZED_SCHEMA
    )


TRANSCODED_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("phash", LongType()),
    ]
)


def transcode_images(images: DataFrame, to_fmt: str) -> DataFrame:
    """Format conversion: decode → re-encode as ``to_fmt``, with the phash
    recomputed from the re-decoded payload (what a verifier downstream can
    reproduce). Arrow-batched mapInPandas like the other image stages."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                _, px = decode_image(bytes(blob))
                out = encode_image(px, to_fmt)
                _, dec = decode_image(out)
                h, w = dec.shape
                rows.append((iid, out, w, h, to_fmt, phash64(dec)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in TRANSCODED_SCHEMA.fields]
            )

    return images.select("image_id", "bytes").mapInPandas(
        gen, schema=TRANSCODED_SCHEMA
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("mean_lum", DoubleType()),
        StructField("std_lum", DoubleType()),
        StructField("edge_density", DoubleType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_image_features(images: DataFrame, grid: int = 4) -> DataFrame:
    """Deterministic image feature extraction: luminance stats, gradient
    edge density, and a grid-of-block-means embedding (grid² floats, unit
    scale) — the shape a CLIP-style encoder slot would fill. Arrow-batched
    numpy; the `features` column is join-compatible with the similarity
    operators (operators/similarity.py)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                _, px = decode_image(bytes(blob))
                f = px.astype(np.float64)
                gy, gx = np.gradient(f)
                edges = float(np.mean(np.hypot(gx, gy) > 8.0))
                blocks = resize_pixels(px, grid, grid).astype(np.float32) / 255.0
                rows.append(
                    (
                        iid,
                        float(f.mean()),
                        float(f.std()),
                        edges,
                        [float(x) for x in blocks.flatten()],
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return images.select("image_id", "bytes").mapInPandas(gen, schema=FEATURES_SCHEMA)


VERIFY_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("fmt", StringType()),
        StructField("psnr_db", DoubleType()),
        StructField("pixel_ok", BooleanType()),
        StructField("phash_ok", BooleanType()),
        StructField("caption_ok", BooleanType()),
        StructField("phash", LongType()),
    ]
)


def verify_images(images: DataFrame, min_psnr_db: float = 40.0) -> DataFrame:
    """Per-row payload invariants vs the reference decode (BASELINE.json
    input_hint): decode ``bytes`` → PSNR against the deterministic reference
    pixels (≥ min_psnr_db for lossy, bit-exact for lossless), recompute phash,
    strict caption equality."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, blob, w, h, fmt, caption, stored_phash in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["fmt"], pdf["caption"], pdf["__ph_str"],
            ):
                # a verifier must FLAG corrupt payloads, never raise: one
                # undecodable blob (or NULL phash) inside a mapInPandas
                # batch would otherwise fail the stage — and in streaming,
                # poison the micro-batch on every replay forever
                try:
                    ref = gen_pixels(iid, int(w), int(h))
                    _, dec = decode_image(bytes(blob))
                    p = psnr(ref, dec)
                    pixel_ok = (
                        bool(np.array_equal(ref, dec))
                        if fmt == "png"
                        else p >= min_psnr_db
                    )
                    ph = phash64(dec)
                    phash_ok = stored_phash is not None and ph == int(
                        stored_phash
                    )
                    rows.append(
                        (
                            iid, fmt,
                            min(p, 99.0),
                            pixel_ok,
                            phash_ok,
                            caption == gen_caption(iid),
                            ph,
                        )
                    )
                except Exception:
                    rows.append((iid, fmt, 0.0, False, False, False, 0))
            yield pd.DataFrame(rows, columns=[f.name for f in VERIFY_SCHEMA.fields])

    # phash travels as a STRING: one NULL in the batch flips pandas'
    # int64 column to float64, silently corrupting every other row's
    # 64-bit hash past 2^53 — the string round-trip is exact
    prepared = images.withColumn("__ph_str", F.col("phash").cast("string"))
    return prepared.mapInPandas(gen, schema=VERIFY_SCHEMA)


def image_meta_quality(
    images: DataFrame,
    min_side: int = 40,
    max_aspect_milli: int = 1500,
    min_caption_words: int = 8,
) -> DataFrame:
    """LAION-style metadata prefilter: ``(image_id, fmt, small, stretched,
    short_caption, keep)`` from the typed metadata columns ALONE — the
    cleaning pass a web-scale image+caption corpus runs FIRST, before any
    byte is decoded (LAION-5B drops min-side/aspect/caption failures at the
    metadata stage; decode-level checks like :func:`verify_images` run only
    on survivors).

    Scale shape: pure codegen integer comparisons — the aspect test is the
    cross-multiplication ``max(w,h)·1000 > max_aspect_milli·min(w,h)`` so
    no float enters the plan, and the projection never touches ``bytes``,
    so on a parquet corpus Catalyst prunes the payload column out of the
    scan entirely (ReadSchema carries only metadata; plan-pinned in tests).
    At 10^10 images this filter costs a metadata-column scan, not an image
    read. Caption words = single-space split, matching the corpus
    generator's join; NULL captions count 0 words (short).
    """
    small = (F.least("w", "h") < F.lit(int(min_side))).alias("small")
    stretched = (
        F.greatest("w", "h") * F.lit(1000)
        > F.lit(int(max_aspect_milli)) * F.least("w", "h")
    ).alias("stretched")
    n_words = F.when(
        F.col("caption").isNull() | (F.col("caption") == ""), F.lit(0)
    ).otherwise(F.size(F.split(F.col("caption"), " ")))
    short = (n_words < F.lit(int(min_caption_words))).alias("short_caption")
    out = images.select("image_id", "fmt", small, stretched, short)
    return out.withColumn(
        "keep",
        ~(F.col("small") | F.col("stretched") | F.col("short_caption")),
    )
