"""Structured Streaming frontier feed (SURVEY.md §2.11 stretch surface).

The reference is strictly batch/level-synchronous (src/crawl4ai_mcp.py:993),
so streaming has no reference counterpart; this module adds the streaming
shape a production crawler needs around the same engine kernels:

- :func:`stream_fetch_results` — ``readStream`` over the append-only fetched
  log (one parquet dir per epoch, exactly what CheckpointManager writes);
- :func:`crawl_metrics_stream` — event-time tumbling-window fetch metrics
  with a watermark bounding late fetch results (the D6 heartbeat/progress
  analog, late-data-safe);
- :func:`chunk_store_stream` — ``foreachBatch`` sink that runs the SAME
  batch chunk→embed→upsert path per micro-batch, writing an idempotent
  keyed parquet store (Iceberg MERGE in production).

All transformations are the batch kernels reused verbatim — the engine's
operators are streaming-safe because they are expressed as stateless column
expressions + keyed aggregations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embedding import with_embeddings
from ..plans.rag import build_chunks

FETCH_SCHEMA = (
    "canonical_url string, host string, depth int, seq long, markdown string, "
    "fetched_at timestamp"
)


def stream_fetch_results(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming source over an append-only directory of fetch-result
    parquet files.

    NOTE: FileStreamSource does not recurse — when each epoch writes its own
    subdirectory (CheckpointManager layout ``fetched/ep_N/``), pass a glob
    (``.../fetched/*``) as ``dir_path``."""
    reader = spark.readStream.schema(FETCH_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(dir_path)


def crawl_metrics_stream(
    fetched: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(window, host) fetch throughput with late-data bound: results
    arriving more than ``watermark`` behind the max observed event time are
    dropped and their window finalized — the streaming twin of the batch
    lineage metrics (S7)."""
    return (
        fetched.withWatermark("fetched_at", watermark)
        .groupBy(F.window("fetched_at", window).alias("w"), "host")
        .agg(
            F.count("*").alias("pages_fetched"),
            F.max("depth").alias("max_depth"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "pages_fetched",
            "max_depth",
        )
    )


def dedup_url_stream(
    fetched: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming URL-seen dedup: keep the first fetch of each
    ``canonical_url`` within the watermark horizon, dropping re-fetches —
    the streaming twin of the batch URL-seen anti-join (J1).

    ``dropDuplicatesWithinWatermark`` keys state by url and evicts entries
    once the watermark passes their event time, so state is bounded by the
    re-fetch horizon instead of growing with the whole crawl (the batch
    path's bloom/cuckoo sets cover the unbounded-history case; this covers
    the within-run duplicate storm — e.g. the same URL discovered by many
    referrers in one window)."""
    # NULL canonical_url (failed canonicalization) must not act as one
    # shared dedup key — same contract as dedup_image_stream's NULL-phash
    # bypass: fall back to the row's unique ``seq`` (global discovery rank,
    # FETCH_SCHEMA) so such rows pass through for downstream triage instead
    # of collapsing to a single survivor.
    dk = F.coalesce(
        F.col("canonical_url"),
        F.concat(F.lit("nullurl:"), F.col("seq").cast("string")),
    )
    return (
        fetched.withColumn("__dk", dk)
        .withWatermark("fetched_at", watermark)
        .dropDuplicatesWithinWatermark(["__dk"])
        .drop("__dk")
    )


def chunk_store_stream(
    fetched: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    chunk_size: int = 800,
    embed_dim: int = 64,
):
    """foreachBatch sink: per micro-batch, chunk → embed → write the keyed
    parquet store, idempotently. foreachBatch user writes are only
    AT-LEAST-ONCE (exactly-once applies to the built-in file sink, not code
    inside foreachBatch): a micro-batch that fails after a partial write is
    replayed with the SAME batch_id, so the write must be a deterministic
    overwrite of the per-batch_id directory — replay rewrites the same dir
    instead of duplicating rows."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(
            F.col("canonical_url").alias("url"), "markdown"
        )
        chunks = build_chunks(docs, chunk_size=chunk_size)
        out = with_embeddings(chunks, text_col="content", dim=embed_dim)
        out = out.dropDuplicates(["url", "chunk_number"])
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_{batch_id}")
        )

    return (
        fetched.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def per_host_crawl_state(
    fetched: DataFrame,
    max_depth_alert: int = 8,
):
    """Custom stateful streaming operator (applyInPandasWithState): per-host
    cumulative crawl state maintained ACROSS micro-batches — total pages,
    deepest depth seen, last event time, and an over-depth alert flag.

    This is the streaming twin of the lineage counters: the batch engine
    derives them per epoch (plans/crawl.py), a long-running stream keeps
    them as keyed state. State is a single small tuple per host, updated
    from Arrow batches — the applyInPandasWithState shape the engine uses
    for any custom stateful operator Spark lacks.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "host string, total_pages long, max_depth int, "
        "last_fetch timestamp, depth_alert boolean"
    )
    state_schema = "total_pages long, max_depth int, last_us long"

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd_

        (host,) = key
        total, mx, last_us = (
            state.get if state.exists else (0, 0, 0)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            total += len(pdf)
            # nullable int arrives as float64; all-NaN max is NaN and
            # int(NaN) raises, wedging the stateful query on replay
            dmax = pdf["depth"].max()
            if not pd_.isna(dmax):
                mx = max(mx, int(dmax))
            ts = pdf["fetched_at"].dropna()
            if len(ts):
                ts_us = ts.astype("datetime64[us]").astype("int64").max()
                last_us = max(last_us, int(ts_us))
        state.update((total, mx, last_us))
        yield pd_.DataFrame(
            {
                "host": [host],
                "total_pages": [total],
                "max_depth": [mx],
                "last_fetch": [pd_.Timestamp(last_us, unit="us")],
                "depth_alert": [mx >= max_depth_alert],
            }
        )

    return fetched.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


IMAGE_FETCH_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, fetched_at timestamp"
)


def stream_image_results(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming source over an append-only directory of fetched-image
    parquet files (the image twin of :func:`stream_fetch_results`; the
    corpus IMAGES_SCHEMA plus the ``fetched_at`` event time)."""
    reader = spark.readStream.schema(IMAGE_FETCH_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(dir_path)


def dedup_image_stream(
    images: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming image near-dup collapse: keep the first image of each exact
    ``phash`` within the watermark horizon — the streaming twin of the
    batch ``dedupe_identical`` star collapse (operators/dedup.hamming_pairs).

    In-stream, identical-phash duplicate storms are the volume case
    (re-crawled logos, blank placeholders, template headers arriving from
    many referrers at once); state is keyed by the 8-byte phash and evicted
    once the watermark passes, so it is bounded by the horizon, not the
    crawl. Cross-hash hamming near-dup stays a batch pass over the stored
    corpus (phash_pairs / phash_pairs_incremental) — a hamming ball is not
    an equality key, so it has no bounded-state streaming form.

    NULL-phash rows (undecodable payloads) bypass the collapse: streaming
    dedup treats NULL as an equal key, which would silently fold every
    corrupt image inside the horizon into one survivor before the verify
    stage could flag them — the dedupe key falls back to the image_id, so
    such rows are never deduped against each other."""
    dk = F.coalesce(
        F.col("phash").cast("string"),
        F.concat(F.lit("nullphash:"), F.col("image_id")),
    )
    return (
        images.withColumn("__dk", dk)
        .withWatermark("fetched_at", watermark)
        .dropDuplicatesWithinWatermark(["__dk"])
        .drop("__dk")
    )


def verify_image_stream(images: DataFrame, min_psnr_db: float = 40.0) -> DataFrame:
    """Payload verify on the stream: the batch verify_images mapInPandas
    kernel applied verbatim — a stateless Arrow transform is streaming-safe,
    so the same per-row invariants (decode, PSNR/bit-exact pixels, phash
    recompute, caption equality) gate images before they reach the store."""
    from ..functions.images import verify_images

    return verify_images(images, min_psnr_db=min_psnr_db)


def change_gate_stream(
    fetched: DataFrame,
    fingerprint_index: DataFrame,
    url_col: str = "canonical_url",
    text_col: str = "markdown",
) -> DataFrame:
    """Streaming recrawl change gate: classify every fetched document in the
    stream as new/changed/unchanged against the STATIC per-URL fingerprint
    index from the previous crawl (plans/rag.update_fingerprint_index), so a
    continuous recrawl feed only forwards rows that need re-chunk/re-embed.

    The streaming twin of plans/rag.doc_change_status: a stream-static LEFT
    join — Spark broadcasts or rescans the static side per micro-batch, the
    stream side never blocks, and no state store is needed because the
    index is read-only within a run (advance it batch-wise with
    update_fingerprint_index between runs). Downstream:
    ``.where("change_kind != 'unchanged'")`` is the cost gate."""
    fp = F.md5(F.col(text_col))
    idx = fingerprint_index.select(
        F.col("url").alias(url_col), F.col("fp").alias("__prev_fp")
    )
    return (
        fetched.withColumn("__fp", fp)
        .join(idx, url_col, "left")
        .withColumn(
            "change_kind",
            # eqNullSafe: md5(NULL markdown) is NULL; a failed extraction
            # for a previously-indexed URL must classify as CHANGED, not
            # slip through the null-propagating != as 'unchanged'
            F.when(F.col("__prev_fp").isNull(), F.lit("new"))
            .when(
                ~F.col("__prev_fp").eqNullSafe(F.col("__fp")),
                F.lit("changed"),
            )
            .otherwise(F.lit("unchanged")),
        )
        .drop("__prev_fp", "__fp")
    )


WARC_STREAM_SCHEMA = "warc_file string, data binary"


def stream_warc_blobs(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming source over an append-only directory of WARC-blob parquet
    files — the archive-ingestion twin of :func:`stream_image_results`.
    At web scale new WARC segments land continuously (Common Crawl
    publishes in monthly waves, a live crawler in minutes); a file-source
    stream turns the batch parse into incremental ingestion with no code
    change to the parser."""
    reader = spark.readStream.schema(WARC_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(dir_path)


def parse_warc_stream(blobs: DataFrame) -> DataFrame:
    """Content-length-framed WARC parse on the stream: the batch
    sources/warc.parse_warc mapInPandas kernel applied verbatim — a
    stateless Arrow transform is streaming-safe, so each arriving blob
    fans out to its response rows incrementally (the verify_image_stream
    precedent)."""
    from ..sources.warc import parse_warc

    return parse_warc(blobs)
