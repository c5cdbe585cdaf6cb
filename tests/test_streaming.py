"""Structured Streaming surface: windowed metrics with watermark/late-data
semantics, and the foreachBatch chunk→embed→store sink.

Emission semantics pinned here (verified against Spark 4.1 behavior):
append-mode windows emit once the watermark (max event time - delay) passes
the window end; rows arriving behind the watermark are dropped for good."""

from __future__ import annotations

import datetime
import os

from mcp_crawl4ai_rag_spark.streaming.ingest import (
    FETCH_SCHEMA,
    chunk_store_stream,
    crawl_metrics_stream,
    stream_fetch_results,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


ROWS_T0 = [
    ("https://h1.example.com/p/1", "h1.example.com", 0, 1, "# doc one body", _ts("2024-01-01 10:00:10")),
    ("https://h1.example.com/p/2", "h1.example.com", 0, 2, "# doc two body", _ts("2024-01-01 10:00:40")),
    ("https://h2.example.com/p/3", "h2.example.com", 1, 3, "# doc three body", _ts("2024-01-01 10:05:30")),
]
LATE_ROW = [
    ("https://h1.example.com/p/9", "h1.example.com", 1, 9, "# late doc", _ts("2024-01-01 10:00:50")),
]
ADVANCER = [
    ("https://h3.example.com/p/10", "h3.example.com", 1, 10, "# fresh doc", _ts("2024-01-01 10:20:00")),
]


def _write_fetch(spark, dir_path, rows, name):
    spark.createDataFrame(rows, FETCH_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(dir_path, name))


def test_windowed_metrics_and_late_data_drop(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            crawl_metrics_stream(
                stream_fetch_results(spark, src + "/*"),
                window="1 minute",
                watermark="2 minutes",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (str(r["window_start"]), r["host"]): r["pages_fetched"]
            for r in spark.read.parquet(out).collect()
        }

    _write_fetch(spark, src, ROWS_T0, "f0")
    got = run_once()
    # watermark reached 10:03:30 → the 10:00 window closed and emitted
    assert got == {("2024-01-01 10:00:00", "h1.example.com"): 2}

    _write_fetch(spark, src, LATE_ROW, "f1")
    got = run_once()
    # the late row (10:00:50, behind the watermark) was DROPPED — the closed
    # window is not re-emitted or updated
    assert got == {("2024-01-01 10:00:00", "h1.example.com"): 2}

    _write_fetch(spark, src, ADVANCER, "f2")
    got = run_once()
    # fresh data advanced the watermark → the 10:05 window closed too
    assert got == {
        ("2024-01-01 10:00:00", "h1.example.com"): 2,
        ("2024-01-01 10:05:00", "h2.example.com"): 1,
    }


def test_foreach_batch_chunk_store(spark, tmp_path):
    src = str(tmp_path / "src2")
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt2")
    _write_fetch(spark, src, ROWS_T0, "f0")

    q = (
        chunk_store_stream(
            stream_fetch_results(spark, src + "/*"), out, ckpt,
            chunk_size=200, embed_dim=16,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stored = spark.read.parquet(os.path.join(out, "*"))
    rows = stored.collect()
    assert {r["url"] for r in rows} == {u for (u, *_rest) in ROWS_T0}
    assert all(len(r["embedding"]) == 16 for r in rows)
    assert all(r["headers"].startswith("#") for r in rows)  # section info ran


def test_stateful_per_host_state_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState: keyed state must accumulate across separate
    micro-batches (restarted from checkpoint between runs)."""
    from mcp_crawl4ai_rag_spark.streaming.ingest import per_host_crawl_state

    src = str(tmp_path / "src3")
    out = str(tmp_path / "state_out")
    ckpt = str(tmp_path / "ckpt3")

    def run_once():
        def sink(df, bid):  # parquet sink rejects update mode; foreachBatch
            df.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

        q = (
            per_host_crawl_state(
                stream_fetch_results(spark, src + "/*"), max_depth_alert=1
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # latest state per host = row with max total_pages
        res = {}
        for r in spark.read.parquet(out + "/*").collect():
            cur = res.get(r["host"])
            if cur is None or r["total_pages"] > cur["total_pages"]:
                res[r["host"]] = r
        return res

    _write_fetch(spark, src, ROWS_T0, "f0")
    got = run_once()
    assert got["h1.example.com"]["total_pages"] == 2
    assert got["h1.example.com"]["max_depth"] == 0
    assert not got["h1.example.com"]["depth_alert"]
    assert got["h2.example.com"]["total_pages"] == 1
    assert got["h2.example.com"]["depth_alert"]  # depth 1 >= alert threshold

    # second micro-batch: h1 gains a depth-1 page → state ACCUMULATES
    _write_fetch(spark, src, LATE_ROW, "f1")
    got = run_once()
    assert got["h1.example.com"]["total_pages"] == 3  # 2 + 1, not 1
    assert got["h1.example.com"]["max_depth"] == 1
    assert got["h1.example.com"]["depth_alert"]
    assert str(got["h1.example.com"]["last_fetch"]).startswith("2024-01-01 10:00:50")


def test_dedup_url_stream_drops_refetches(spark, tmp_path):
    from mcp_crawl4ai_rag_spark.streaming.ingest import dedup_url_stream

    src = str(tmp_path / "dsrc")
    out = str(tmp_path / "dsink")
    ckpt = str(tmp_path / "dckpt")

    def run_once():
        q = (
            dedup_url_stream(stream_fetch_results(spark, src + "/*"))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: p/1 appears twice (two referrers in the same window)
    dup = [
        ("https://h1.example.com/p/1", "h1.example.com", 0, 1, "# a", _ts("2024-01-01 10:00:10")),
        ("https://h1.example.com/p/1", "h1.example.com", 1, 2, "# a again", _ts("2024-01-01 10:00:20")),
        ("https://h1.example.com/p/2", "h1.example.com", 0, 3, "# b", _ts("2024-01-01 10:00:30")),
    ]
    _write_fetch(spark, src, dup, "b0")
    run_once()
    # batch 2: p/1 re-fetched within the watermark horizon -> still dropped
    _write_fetch(
        spark, src,
        [("https://h1.example.com/p/1", "h1.example.com", 2, 4, "# a 3rd", _ts("2024-01-01 10:02:00"))],
        "b1",
    )
    run_once()
    got = spark.read.parquet(out)
    urls = sorted(r["canonical_url"] for r in got.select("canonical_url").collect())
    assert urls == [
        "https://h1.example.com/p/1",
        "https://h1.example.com/p/2",
    ]
    # the FIRST fetch won (streaming arrival order within the batch)
    kept = got.where("canonical_url like '%p/1'").head()
    assert kept["seq"] == 1


def test_image_stream_dedup_and_verify(spark, tmp_path):
    """Image stream: identical-phash re-fetches collapse within the
    watermark horizon, and the batch verify kernel gates payloads on the
    stream (a planted caption swap is flagged, everything else verifies)."""
    import pyspark.sql.functions as F

    from mcp_crawl4ai_rag_spark.sources.corpus import gen_images
    from mcp_crawl4ai_rag_spark.streaming.ingest import (
        dedup_image_stream,
        stream_image_results,
        verify_image_stream,
    )

    src = str(tmp_path / "isrc")
    out = str(tmp_path / "isink")
    ckpt = str(tmp_path / "ickpt")

    def run_once():
        q = (
            dedup_image_stream(stream_image_results(spark, src + "/*"))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    imgs = gen_images(spark, 12, partitions=2).localCheckpoint(eager=True)
    base = imgs.withColumn("fetched_at", F.lit(_ts("2024-01-01 10:00:10")))
    base.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))
    run_once()
    # re-fetches in the NEXT micro-batch: 4 images arrive again under new
    # ids, same payload (same phash), 90 s later — inside the horizon, so
    # state from batch 1 must drop them deterministically; one carries a
    # swapped caption (would fail verify if it survived dedup)
    refetch = (
        imgs.where("CAST(substring(image_id, 5) AS BIGINT) % 3 = 0")
        .select(
            F.concat(F.lit("re_"), F.col("image_id")).alias("image_id"),
            "bytes", "w", "h", "fmt",
            F.lit("swapped caption").alias("caption"),
            "phash",
        )
        .withColumn("fetched_at", F.lit(_ts("2024-01-01 10:01:40")))
    )
    refetch.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 12  # every re-fetch collapsed onto its original
    assert got.where(F.col("image_id").startswith("re_")).count() == 0

    # verify kernel on a stream over the deduped store: all 12 originals
    # pass every invariant
    vq = (
        verify_image_stream(
            stream_image_results(spark, out)
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("img_verify")
        .trigger(availableNow=True)
        .start()
    )
    vq.awaitTermination(120)
    v = spark.sql("select * from img_verify")
    assert v.count() == 12
    assert (
        v.where("pixel_ok AND phash_ok AND caption_ok").count() == 12
    )


def test_change_gate_stream_forwards_only_changed_and_new(spark, tmp_path):
    """Streaming recrawl gate: a fetch stream joined against the previous
    crawl's static fingerprint index forwards only changed/new documents."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.streaming.ingest import change_gate_stream

    src = str(tmp_path / "csrc")
    out = str(tmp_path / "csink")
    ckpt = str(tmp_path / "cckpt")

    # previous crawl: p/1 and p/2 stored with their md5 fingerprints
    prev = spark.createDataFrame(
        [
            ("https://h1.example.com/p/1", "# doc one body"),
            ("https://h1.example.com/p/2", "# doc two body"),
        ],
        "url string, markdown string",
    ).select("url", F.md5("markdown").alias("fp"))

    # recrawl stream: p/1 unchanged, p/2 changed, p/7 brand-new
    rows = [
        ("https://h1.example.com/p/1", "h1.example.com", 0, 1, "# doc one body", _ts("2024-01-01 10:00:10")),
        ("https://h1.example.com/p/2", "h1.example.com", 0, 2, "# doc two body EDITED", _ts("2024-01-01 10:00:20")),
        ("https://h1.example.com/p/7", "h1.example.com", 0, 3, "# doc seven body", _ts("2024-01-01 10:00:30")),
    ]
    _write_fetch(spark, src, rows, "b0")

    gated = change_gate_stream(stream_fetch_results(spark, src + "/*"), prev)
    q = (
        gated.where("change_kind != 'unchanged'")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["canonical_url"]: r["change_kind"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        "https://h1.example.com/p/2": "changed",
        "https://h1.example.com/p/7": "new",
    }


def test_change_gate_stream_null_markdown_is_changed(spark, tmp_path):
    """Streaming twin of the NULL-fingerprint contract: md5(NULL markdown)
    is NULL; for a previously-indexed URL that must be CHANGED (forwarded
    to re-process), never 'unchanged'."""
    import pyspark.sql.functions as F

    from mcp_crawl4ai_rag_spark.streaming.ingest import change_gate_stream

    src = str(tmp_path / "csrc")
    out = str(tmp_path / "csink")
    ckpt = str(tmp_path / "cckpt")
    idx = spark.createDataFrame(
        [("u1", "a" * 32), ("u2", "b" * 32)], "url string, fp string"
    )
    batch = spark.createDataFrame(
        [("u1", None, _ts("2024-01-01 10:00:10")),
         ("u2", "same", _ts("2024-01-01 10:00:11")),
         ("u9", None, _ts("2024-01-01 10:00:12"))],
        "canonical_url string, markdown string, fetched_at timestamp",
    )
    batch.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))
    stream = (
        spark.readStream.schema("canonical_url string, markdown string, fetched_at timestamp")
        .parquet(src + "/*")
    )
    q = (
        change_gate_stream(stream, idx)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["canonical_url"]: r["change_kind"]
        for r in spark.read.parquet(out).collect()
    }
    # u1: NULL fp vs stored → changed; u2: md5('same') != stored → changed;
    # u9: not indexed → new
    assert got["u1"] == "changed" and got["u9"] == "new"
    assert got["u2"] == "changed"


def test_dedup_image_stream_null_phash_rows_all_survive(spark, tmp_path):
    """NULL-phash (undecodable) images must NOT collapse to one survivor:
    streaming dedup treats NULL as an equal key, so the dedupe key falls
    back to the image_id for such rows."""
    import pyspark.sql.functions as F

    from mcp_crawl4ai_rag_spark.sources.corpus import gen_images
    from mcp_crawl4ai_rag_spark.streaming.ingest import (
        dedup_image_stream,
        stream_image_results,
    )

    src = str(tmp_path / "nsrc")
    out = str(tmp_path / "nsink")
    ckpt = str(tmp_path / "nckpt")
    imgs = gen_images(spark, 6, partitions=1).localCheckpoint(eager=True)
    batch = imgs.withColumn("fetched_at", F.lit(_ts("2024-01-01 10:00:10"))).withColumn(
        "phash",
        F.when(F.expr("CAST(substring(image_id, 5) AS BIGINT) < 3"), F.lit(None)).otherwise(
            F.col("phash")
        ),
    )
    batch.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))
    q = (
        dedup_image_stream(stream_image_results(spark, src + "/*"))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out)
    # all 3 NULL-phash rows survive; schema unchanged (no __dk leaks)
    assert rows.where(F.col("phash").isNull()).count() == 3
    assert rows.count() == 6
    assert "__dk" not in rows.columns


def test_verify_image_stream_forwards_psnr_threshold(spark):
    """min_psnr_db must reach the batch kernel (it was silently dropped)."""
    from unittest.mock import patch

    from mcp_crawl4ai_rag_spark.sources.corpus import gen_images
    from mcp_crawl4ai_rag_spark.streaming.ingest import verify_image_stream

    imgs = gen_images(spark, 1, partitions=1)
    with patch(
        "mcp_crawl4ai_rag_spark.functions.images.verify_images"
    ) as vi:
        verify_image_stream(imgs, min_psnr_db=33.0)
        vi.assert_called_once_with(imgs, min_psnr_db=33.0)


def test_warc_stream_parses_incrementally(spark, tmp_path):
    """Archive blobs arriving as two file batches parse through the real
    streaming engine into exactly the batch parse's rows — the Common
    Crawl incremental-ingestion shape (markdown extraction composes on
    the stream too: stateless Arrow transforms chain)."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.functions.html import extract_markdown
    from mcp_crawl4ai_rag_spark.sources.corpus import WARC_404_MOD, gen_warc_blobs
    from mcp_crawl4ai_rag_spark.sources.warc import parse_warc
    from mcp_crawl4ai_rag_spark.streaming.ingest import (
        parse_warc_stream,
        stream_warc_blobs,
    )

    n = 80
    blobs = gen_warc_blobs(spark, n, records_per_blob=20)  # 4 blobs
    src = str(tmp_path / "warcsrc")
    out = str(tmp_path / "warcsink")
    ckpt = str(tmp_path / "warcckpt")
    # two arrival waves: blobs 0-1 then 2-3
    blobs.where(F.col("warc_file") <= "crawl-000001.warc.gz").write.parquet(
        src + "/b0"
    )

    def run_once():
        q = (
            extract_markdown(
                parse_warc_stream(
                    stream_warc_blobs(spark, src + "/*")
                ).where(F.col("status") == 200),
                "html",
                "markdown",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out).count()
    assert first == sum(
        1 for i in range(40) if i % WARC_404_MOD != 0
    )
    blobs.where(F.col("warc_file") > "crawl-000001.warc.gz").write.parquet(
        src + "/b1"
    )
    run_once()
    got = spark.read.parquet(out)
    want = (
        extract_markdown(
            parse_warc(gen_warc_blobs(spark, n, records_per_blob=20)).where(
                F.col("status") == 200
            ),
            "html",
            "markdown",
        )
        .select("url", "markdown")
    )
    g = {(r["url"], r["markdown"]) for r in got.select("url", "markdown").collect()}
    w = {(r["url"], r["markdown"]) for r in want.collect()}
    assert g == w and len(g) == sum(1 for i in range(n) if i % WARC_404_MOD != 0)
