"""Image payload invariants (BASELINE.json input_hint): decoded-pixel
PSNR ≥ 40 dB for lossy fmt, bit-exact for lossless, caption equality,
phash recompute — via the deterministic fake codec (PIL not in container)."""

import numpy as np
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions.images import (
    decode_image,
    encode_image,
    gen_caption,
    gen_pixels,
    phash64,
    psnr,
    verify_images,
)
from mcp_crawl4ai_rag_spark.sources.corpus import gen_images


def test_png_roundtrip_bitexact():
    px = gen_pixels("img_000000000001", 40, 32)
    fmt, dec = decode_image(encode_image(px, "png"))
    assert fmt == "png" and np.array_equal(px, dec)


def test_jpeg_roundtrip_psnr():
    px = gen_pixels("img_000000000002", 64, 48)
    fmt, dec = decode_image(encode_image(px, "jpeg"))
    assert fmt == "jpeg"
    p = psnr(px, dec)
    assert 40.0 <= p < 99.0


def test_pixels_deterministic():
    a = gen_pixels("img_x", 32, 32)
    b = gen_pixels("img_x", 32, 32)
    c = gen_pixels("img_y", 32, 32)
    assert np.array_equal(a, b) and not np.array_equal(a, c)
    assert gen_caption("img_x") == gen_caption("img_x")
    assert gen_caption("img_x") != gen_caption("img_y")


def test_phash_stability():
    px = gen_pixels("img_z", 48, 48)
    assert phash64(px) == phash64(px.copy())
    # quantization must not flip the phash (block means move by ≤2 gray levels)
    _, dec = decode_image(encode_image(px, "jpeg"))
    assert phash64(dec) == phash64(px) or bin(
        np.uint64(phash64(dec) ^ phash64(px)).item()
    ).count("1") <= 2


def test_verify_images_all_pass(spark):
    images = gen_images(spark, 64, partitions=4)
    v = verify_images(images).cache()
    n = v.count()
    assert n == 64
    assert v.where(~F.col("pixel_ok")).count() == 0
    assert v.where(~F.col("phash_ok")).count() == 0
    assert v.where(~F.col("caption_ok")).count() == 0
    assert v.where((F.col("fmt") == "jpeg") & (F.col("psnr_db") < 40.0)).count() == 0
    v.unpersist()


def test_resize_images_roundtrip(spark):
    from mcp_crawl4ai_rag_spark.functions.images import (
        decode_image,
        gen_pixels,
        resize_images,
        resize_pixels,
    )
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_images

    imgs = gen_images(spark, 20, partitions=4)
    out = {r["image_id"]: r for r in resize_images(imgs, 16, 24).collect()}
    assert len(out) == 20
    for iid, r in list(out.items())[:5]:
        assert (r["w"], r["h"]) == (16, 24)
        fmt, px = decode_image(bytes(r["bytes"]))
        assert px.shape == (24, 16)
        if fmt == "png":  # lossless: resize of reference pixels matches exactly
            src = gen_pixels(iid, *_wh(iid))
            import numpy as np

            assert np.array_equal(px, resize_pixels(src, 16, 24))


def _wh(image_id):
    # mirror corpus.gen_images geometry: w=32+(i%5)*8, h=32+(i%3)*16
    i = int(image_id.split("_")[1])
    return 32 + (i % 5) * 8, 32 + (i % 3) * 16


def test_extract_image_features_deterministic(spark):
    import numpy as np

    from mcp_crawl4ai_rag_spark.functions.images import (
        decode_image,
        extract_image_features,
    )
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_images

    imgs = gen_images(spark, 10, partitions=2).localCheckpoint(eager=True)
    blobs = {r["image_id"]: bytes(r["bytes"]) for r in imgs.collect()}
    feats = {r["image_id"]: r for r in extract_image_features(imgs).collect()}
    assert len(feats) == 10
    for iid, r in feats.items():
        _, px = decode_image(blobs[iid])
        assert abs(r["mean_lum"] - float(px.mean())) < 1e-9
        assert len(r["features"]) == 16
        assert 0.0 <= r["edge_density"] <= 1.0
        assert all(0.0 <= x <= 1.0 for x in r["features"])


def test_verify_images_flags_corrupt_payloads_instead_of_raising(spark):
    """One undecodable blob / NULL phash inside a batch must yield a
    failed-verify ROW, not a stage exception (in streaming a raise poisons
    the micro-batch on every replay)."""
    import pyspark.sql.functions as F

    from mcp_crawl4ai_rag_spark.functions.images import verify_images
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_images

    imgs = gen_images(spark, 4, partitions=1)
    corrupted = imgs.withColumn(
        "bytes",
        F.when(
            F.expr("CAST(substring(image_id, 5) AS BIGINT) = 0"),
            F.lit(b"not an image"),
        ).otherwise(F.col("bytes")),
    ).withColumn(
        "phash",
        F.when(
            F.expr("CAST(substring(image_id, 5) AS BIGINT) = 1"), F.lit(None)
        ).otherwise(F.col("phash")),
    )
    got = {r["image_id"]: r for r in verify_images(corrupted).collect()}
    assert len(got) == 4
    bad = got["img_000000000000"]
    assert not bad["pixel_ok"] and not bad["phash_ok"] and not bad["caption_ok"]
    nullp = got["img_000000000001"]
    assert nullp["pixel_ok"] and not nullp["phash_ok"]  # decodes, phash unverifiable
    assert got["img_000000000002"]["phash_ok"] and got["img_000000000003"]["phash_ok"]


def test_image_meta_quality_flags_and_keep(spark):
    from mcp_crawl4ai_rag_spark.functions.images import image_meta_quality

    rows = [
        # (id, w, h, fmt, caption): keep / small / stretched / short cases
        ("ok", 48, 48, "png", "a b c d e f g h"),
        ("small_w", 32, 48, "png", "a b c d e f g h"),
        ("stretch", 48, 96, "jpeg", "a b c d e f g h"),
        ("short", 48, 48, "jpeg", "a b c"),
        ("null_cap", 48, 48, "png", None),
        ("empty_cap", 48, 48, "png", ""),
        ("boundary", 40, 60, "png", "a b c d e f g h"),  # aspect == 1.5 OK
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, caption string"
    )
    got = {
        r["image_id"]: (r["small"], r["stretched"], r["short_caption"], r["keep"])
        for r in image_meta_quality(df).collect()
    }
    assert got["ok"] == (False, False, False, True)
    assert got["small_w"] == (True, False, False, False)
    assert got["stretch"] == (False, True, False, False)
    assert got["short"] == (False, False, True, False)
    assert got["null_cap"][2] is True and got["null_cap"][3] is False
    assert got["empty_cap"][2] is True
    # 60*1000 == 1500*40 exactly: NOT stretched (strict >)
    assert got["boundary"] == (False, False, False, True)


def test_image_meta_quality_prunes_bytes_from_parquet_scan(spark, tmp_path):
    from mcp_crawl4ai_rag_spark.functions.images import image_meta_quality
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_images

    p = str(tmp_path / "imgs")
    gen_images(spark, 40, partitions=2).write.parquet(p)
    out = image_meta_quality(spark.read.parquet(p))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the metadata prefilter must never materialize the payload column
    assert "Exchange" not in plan
    import re

    rs = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert rs and "bytes" not in rs.group(1), plan
    # and the per-fmt counts agree with a driver-side recount
    rows = spark.read.parquet(p).select("image_id", "w", "h", "caption").collect()
    want_keep = sum(
        1
        for r in rows
        if min(r["w"], r["h"]) >= 40
        and max(r["w"], r["h"]) * 1000 <= 1500 * min(r["w"], r["h"])
        and len(r["caption"].split(" ")) >= 8
    )
    assert out.where("keep").count() == want_keep
