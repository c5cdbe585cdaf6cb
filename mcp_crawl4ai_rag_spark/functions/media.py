"""Multimodal (audio / video) payload kernels.

Companion to functions/images.py: audio and video are opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages (one numpy pipeline per batch, no per-row Python at the DataFrame
boundary). The reference crawler treats media purely as *binary URLs to
skip* (src/crawl4ai_mcp.py:131-144); here they are first-class payloads —
the SURVEY.md training-data multimodal additions.

CODEC STUB NOTE: no audio/video codec libraries exist in this container, so
the containers below are *deterministic fakes* (zlib'd PCM / zlib'd frame
stacks with a tiny header). The Spark-side plumbing — binary schema,
mapInPandas signatures, per-batch shapes, frame-explode partitioning — is
real and tested; swapping in ffmpeg/soundfile touches only the
``encode_* / decode_*`` pairs.

Scale shape
-----------
- Decode/feature/resample stages are stateless mapInPandas over the payload
  column: no shuffle, pushdown-friendly (the scan reads only the columns the
  stage selects), and each Arrow batch amortizes Python dispatch over
  thousands of rows.
- ``sample_frames`` fans one video row out to ceil(n_frames/stride) frame
  rows *inside* the batch iterator — the explosion happens executor-side
  with no join and no shuffle; downstream per-frame ops (phash, features,
  similarity) then parallelize over frames, not videos.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .images import phash64

_AUDIO_MAGIC = b"SGAU"  # fmt(1B: 0=pcm,1=qpcm) | sr u32 | n u32 | zlib(int16 LE)
_VIDEO_MAGIC = b"SGVD"  # w u16 | h u16 | n_frames u16 | fps u8 | zlib(frames)
_QPCM_STEP = 64  # lossy quantization step on int16 → max abs err 32


def _seed_for(media_id: str) -> int:
    d = hashlib.blake2b(media_id.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big")


# --------------------------------------------------------------------------
# audio codec (fake, deterministic)
# --------------------------------------------------------------------------


def gen_waveform(audio_id: str, sr: int, n_samples: int) -> np.ndarray:
    """Deterministic int16 PCM: two seeded sine partials + low seeded noise."""
    seed = _seed_for(audio_id)
    f1 = 200.0 + (seed % 200)
    f2 = 400.0 + ((seed >> 16) % 300)
    t = np.arange(n_samples, dtype=np.float64) / sr
    rng = np.random.Generator(np.random.PCG64(seed ^ 0xA11D10))
    wave = (
        9000.0 * np.sin(2 * np.pi * f1 * t)
        + 6000.0 * np.sin(2 * np.pi * f2 * t)
        + rng.integers(-500, 500, n_samples)
    )
    return np.clip(wave, -32768, 32767).astype(np.int16)


def encode_audio(samples: np.ndarray, sr: int, fmt: str) -> bytes:
    if fmt == "qpcm":
        payload = ((samples.astype(np.int32) // _QPCM_STEP) * _QPCM_STEP).astype(
            np.int16
        )
        code = 1
    elif fmt == "pcm":
        payload = samples
        code = 0
    else:
        raise NotImplementedError(f"codec stub supports pcm/qpcm, got {fmt!r}")
    return (
        _AUDIO_MAGIC
        + struct.pack("<BII", code, sr, len(samples))
        + zlib.compress(payload.astype("<i2").tobytes(), 6)
    )


def decode_audio(blob: bytes) -> tuple[str, int, np.ndarray]:
    if blob[:4] != _AUDIO_MAGIC:
        raise ValueError("not a fake-codec audio clip")
    code, sr, n = struct.unpack("<BII", blob[4:13])
    if sr <= 0:
        raise ValueError(f"corrupt audio header: sr={sr}")
    raw = zlib.decompress(blob[13:])
    samples = np.frombuffer(raw, dtype="<i2")
    # a truncated/padded payload must fail decode, not silently shorten —
    # mirrors decode_image, whose reshape((h, w)) rejects bad lengths
    if len(samples) != n:
        raise ValueError(
            f"corrupt audio payload: header says {n} samples, got {len(samples)}"
        )
    return ("qpcm" if code == 1 else "pcm"), sr, samples


def snr_db(ref: np.ndarray, dec: np.ndarray) -> float:
    noise = ref.astype(np.float64) - dec.astype(np.float64)
    p_noise = float(np.mean(noise**2))
    if p_noise == 0:
        return float("inf")
    p_sig = float(np.mean(ref.astype(np.float64) ** 2))
    return 10.0 * np.log10(p_sig / p_noise)


# --------------------------------------------------------------------------
# video codec (fake, deterministic)
# --------------------------------------------------------------------------


def gen_frame(video_id: str, w: int, h: int, frame_idx: int) -> np.ndarray:
    """Frame k = base pattern rolled k columns — deterministic 'motion'."""
    from .images import gen_pixels

    base = gen_pixels(video_id, w, h)
    return np.roll(base, frame_idx, axis=1)


def encode_video(frames: np.ndarray, fps: int) -> bytes:
    n, h, w = frames.shape
    return (
        _VIDEO_MAGIC
        + struct.pack("<HHHB", w, h, n, fps)
        + zlib.compress(frames.astype(np.uint8).tobytes(), 6)
    )


def decode_video(blob: bytes) -> tuple[int, np.ndarray]:
    """→ (fps, frames[n, h, w] uint8)."""
    if blob[:4] != _VIDEO_MAGIC:
        raise ValueError("not a fake-codec video")
    w, h, n, fps = struct.unpack("<HHHB", blob[4:11])
    if fps <= 0:
        # mirror decode_audio's sr guard: a zero-fps header would reach
        # duration math (n*1000 // fps) and ZeroDivisionError mid-batch
        raise ValueError(f"corrupt video header: fps={fps}")
    raw = zlib.decompress(blob[11:])
    return fps, np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w)


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------

AUDIO_VERIFY_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("fmt", StringType()),
        StructField("sr", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sample_ok", BooleanType()),
    ]
)


def verify_audio(audio: DataFrame, min_snr_db: float = 30.0) -> DataFrame:
    """Per-clip payload invariants: decode ``bytes`` → header metadata must
    round-trip, and samples must match the deterministic reference waveform
    (bit-exact for pcm, SNR ≥ min_snr_db for lossy qpcm). Mirrors
    functions/images.verify_images."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf["audio_id"], pdf["bytes"]):
                fmt, sr, dec = decode_audio(bytes(blob))
                ref = gen_waveform(aid, sr, len(dec))
                if fmt == "pcm":
                    ok = bool(np.array_equal(ref, dec))
                else:
                    ok = snr_db(ref, dec) >= min_snr_db
                rows.append(
                    (aid, fmt, sr, len(dec), int(len(dec) * 1000) // sr, ok)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_VERIFY_SCHEMA.fields]
            )

    return audio.select("audio_id", "bytes").mapInPandas(
        gen, schema=AUDIO_VERIFY_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("duration_ms", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("zero_crossings", LongType()),
    ]
)


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """Deterministic audio feature extraction: duration, RMS level, peak,
    zero-crossing count — the slots a real DSP/ASR frontend would fill."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf["audio_id"], pdf["bytes"]):
                _, sr, s = decode_audio(bytes(blob))
                f = s.astype(np.float64)
                zc = int(np.count_nonzero(np.signbit(f[1:]) != np.signbit(f[:-1])))
                rows.append(
                    (
                        aid,
                        int(len(s) * 1000) // sr,
                        float(np.sqrt(np.mean(f**2))),
                        int(np.max(np.abs(f))) if len(s) else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return audio.select("audio_id", "bytes").mapInPandas(
        gen, schema=AUDIO_FEATURES_SCHEMA
    )


def resample_audio(audio: DataFrame, out_sr: int) -> DataFrame:
    """Nearest-neighbor resample to ``out_sr`` (deterministic, numpy-only —
    a polyphase filter swaps in with a real DSP dependency). Output keeps
    the corpus payload shape (audio_id, bytes, sr, n_samples, fmt)."""
    schema = StructType(
        [
            StructField("audio_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("sr", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("fmt", StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf["audio_id"], pdf["bytes"]):
                fmt, sr, s = decode_audio(bytes(blob))
                n_out = (len(s) * out_sr) // sr
                idx = (np.arange(n_out) * sr // out_sr).clip(0, max(len(s) - 1, 0))
                out = s[idx] if len(s) else s
                rows.append(
                    (aid, encode_audio(out, out_sr, fmt), out_sr, n_out, fmt)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return audio.select("audio_id", "bytes").mapInPandas(gen, schema=schema)


FRAMES_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("frame_phash", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(videos: DataFrame, stride: int = 3) -> DataFrame:
    """Frame sampling: decode each video and emit every ``stride``-th frame
    as its own row, re-encoded with the (fake) image codec so every
    downstream image operator (resize, features, phash similarity) applies
    per-frame. The fan-out happens inside the Arrow batch — no join, no
    shuffle; one input row yields ceil(n_frames/stride) output rows."""
    from .images import encode_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf["video_id"], pdf["bytes"]):
                _, frames = decode_video(bytes(blob))
                n, h, w = frames.shape
                for k in range(0, n, stride):
                    fr = frames[k]
                    rows.append(
                        (vid, k, w, h, phash64(fr), encode_image(fr, "png"))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return videos.select("video_id", "bytes").mapInPandas(gen, schema=FRAMES_SCHEMA)


VIDEO_FEATURES_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("motion", DoubleType()),
    ]
)


def extract_video_features(videos: DataFrame) -> DataFrame:
    """Per-video stats: frame count, fps, duration, and motion energy (mean
    absolute inter-frame difference) — the shape a real codec/flow frontend
    would fill."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf["video_id"], pdf["bytes"]):
                fps, frames = decode_video(bytes(blob))
                n = frames.shape[0]
                motion = (
                    float(
                        np.mean(
                            np.abs(
                                frames[1:].astype(np.float64)
                                - frames[:-1].astype(np.float64)
                            )
                        )
                    )
                    if n > 1
                    else 0.0
                )
                rows.append((vid, n, fps, int(n * 1000) // fps, motion))
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FEATURES_SCHEMA.fields]
            )

    return videos.select("video_id", "bytes").mapInPandas(
        gen, schema=VIDEO_FEATURES_SCHEMA
    )
