"""Audio/video payload kernels: codecs, verify, features, frame sampling."""

import numpy as np
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions.media import (
    decode_audio,
    decode_video,
    encode_audio,
    encode_video,
    extract_audio_features,
    extract_video_features,
    gen_frame,
    gen_waveform,
    resample_audio,
    sample_frames,
    snr_db,
    verify_audio,
)
from mcp_crawl4ai_rag_spark.sources.corpus import gen_audio, gen_videos


def test_audio_codec_roundtrip_lossless():
    w = gen_waveform("aud_x", 8000, 4000)
    fmt, sr, dec = decode_audio(encode_audio(w, 8000, "pcm"))
    assert (fmt, sr) == ("pcm", 8000)
    assert np.array_equal(w, dec)


def test_audio_codec_lossy_snr():
    w = gen_waveform("aud_y", 16000, 8000)
    fmt, sr, dec = decode_audio(encode_audio(w, 16000, "qpcm"))
    assert fmt == "qpcm"
    assert not np.array_equal(w, dec)
    assert snr_db(w, dec) >= 30.0


def test_video_codec_roundtrip():
    frames = np.stack([gen_frame("vid_x", 32, 48, k) for k in range(5)])
    fps, dec = decode_video(encode_video(frames, 8))
    assert fps == 8
    assert np.array_equal(frames, dec)
    # motion: frame k is base rolled k columns
    assert np.array_equal(dec[2], np.roll(dec[0], 2, axis=1))


def test_verify_audio_all_ok(spark):
    clips = gen_audio(spark, 60, partitions=4)
    v = verify_audio(clips).cache()
    assert v.count() == 60
    assert v.where(~F.col("sample_ok")).count() == 0
    # metadata round-trips the generation formulas
    row = v.where(F.col("audio_id") == "aud_000000000001").head()
    assert row["fmt"] == "qpcm" and row["sr"] == 12000
    assert row["duration_ms"] == row["n_samples"] * 1000 // row["sr"]


def test_verify_audio_detects_corruption(spark):
    clips = gen_audio(spark, 4, partitions=1)
    # swap payloads between two clips: metadata decodes, samples mismatch
    rows = clips.collect()
    swapped = spark.createDataFrame(
        [(rows[0]["audio_id"], bytes(rows[2]["bytes"]))],
        "audio_id string, bytes binary",
    )
    v = verify_audio(swapped).head()
    assert not v["sample_ok"]


def test_resample_audio_preserves_duration(spark):
    clips = gen_audio(spark, 10, partitions=2)
    out = resample_audio(clips, 4000)
    got = {r["audio_id"]: r for r in out.collect()}
    for r in clips.collect():
        o = got[r["audio_id"]]
        assert o["sr"] == 4000
        assert o["n_samples"] == r["n_samples"] * 4000 // r["sr"]
        fmt, sr, dec = decode_audio(bytes(o["bytes"]))
        assert sr == 4000 and len(dec) == o["n_samples"]


def test_audio_features_match_numpy(spark):
    clips = gen_audio(spark, 8, partitions=2)
    feats = {r["audio_id"]: r for r in extract_audio_features(clips).collect()}
    for r in clips.collect():
        _, sr, s = decode_audio(bytes(r["bytes"]))
        f = s.astype(np.float64)
        got = feats[r["audio_id"]]
        assert got["rms"] == float(np.sqrt(np.mean(f**2)))
        assert got["peak"] == int(np.max(np.abs(f)))


def test_sample_frames_counts_and_content(spark):
    vids = gen_videos(spark, 12, partitions=2)
    fr = sample_frames(vids, stride=3).cache()
    # per-video row count = ceil(n_frames / 3), closed-form from id formulas
    per = {r["video_id"]: r["cnt"] for r in fr.groupBy("video_id").agg(F.count("*").alias("cnt")).collect()}
    for r in vids.select("video_id", "n_frames").collect():
        assert per[r["video_id"]] == -(-r["n_frames"] // 3)
    # a sampled frame decodes (via the image codec) to the rolled base pattern
    from mcp_crawl4ai_rag_spark.functions.images import decode_image

    row = fr.where((F.col("video_id") == "vid_000000000000") & (F.col("frame_idx") == 3)).head()
    _, px = decode_image(bytes(row["frame_bytes"]))
    assert np.array_equal(px, gen_frame("vid_000000000000", row["w"], row["h"], 3))


def test_video_features(spark):
    vids = gen_videos(spark, 6, partitions=2)
    feats = {r["video_id"]: r for r in extract_video_features(vids).collect()}
    for r in vids.collect():
        got = feats[r["video_id"]]
        assert got["n_frames"] == r["n_frames"] and got["fps"] == r["fps"]
        assert got["duration_ms"] == r["n_frames"] * 1000 // r["fps"]
        assert got["motion"] > 0.0


def test_decode_audio_rejects_truncated_and_corrupt_header():
    import struct
    import zlib

    import pytest

    w = gen_waveform("aud_t", 8000, 1000)
    blob = encode_audio(w, 8000, "pcm")
    # truncate the payload: header still claims 1000 samples
    head, payload = blob[:13], zlib.decompress(blob[13:])
    truncated = head + zlib.compress(payload[: len(payload) // 2], 6)
    with pytest.raises(ValueError, match="corrupt audio payload"):
        decode_audio(truncated)
    # zero sample rate in the header
    bad_sr = blob[:4] + struct.pack("<BII", 0, 0, 1000) + blob[13:]
    with pytest.raises(ValueError, match="corrupt audio header"):
        decode_audio(bad_sr)


def test_frame_dedup_across_reuploaded_videos(spark):
    """Video→image composition: a re-uploaded clip (same payload, new id)
    yields frame-for-frame identical phashes; phash_pairs with the linear
    dedupe_identical contract emits exactly one star edge per sampled
    frame, keyed so each original frame is the representative."""
    import pyspark.sql.functions as F

    from mcp_crawl4ai_rag_spark.functions.media import sample_frames
    from mcp_crawl4ai_rag_spark.operators.dedup import phash_pairs

    vids = gen_videos(spark, 4, partitions=2)
    reup = vids.where("video_id = 'vid_000000000000'").select(
        F.lit("vid_reup").alias("video_id"),
        *[c for c in vids.columns if c != "video_id"],
    )
    frames = sample_frames(vids.unionByName(reup), stride=3).select(
        F.concat_ws(":", "video_id", F.col("frame_idx").cast("string")).alias(
            "frame_key"
        ),
        F.col("frame_phash").alias("phash"),
    )
    pairs = phash_pairs(
        frames, id_col="frame_key", max_hamming=0, n_chunks=8,
        dedupe_identical=True,
    ).collect()
    n_sampled = frames.where(
        F.col("frame_key").startswith("vid_reup")
    ).count()
    stars = [r for r in pairs if r["id_b"].startswith("vid_reup:")]
    assert len(stars) == n_sampled > 0
    # every reup frame's representative is the matching original frame
    for r in stars:
        assert r["id_a"] == "vid_000000000000:" + r["id_b"].split(":")[1]
        assert r["hamming"] == 0
