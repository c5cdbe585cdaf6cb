"""Interleaved A/B: frontier localCheckpoint storage level (deser vs ser).

Context (round 3): the pre-fix witness-clean scaling snapshot recorded
bloom_sec_hi 18.0 vs bloom_sec_lo 2.0 on the SAME input — the bloom fold
slowed ~9x only at 32 cores. After the kernel fixes (division-free probe
indices, size-routed scatter) the standalone fold takes ~2.4 s at 32 cores
in a JVM with no other blocks resident, but ad-hoc runs with the 16M-row
frontier localCheckpoint resident ranged 2-14 s under ambient host noise.
Hypothesis worth deciding with clean data: the DEFAULT localCheckpoint
level (MEMORY_AND_DISK_DESER in PySpark 4 naming) stores millions of live
row objects, and their residency taxes concurrent mapInPandas folds (GC
marking + TLB) at high core counts; a serialized level (MEMORY_AND_DISK,
deserialized=False) stores compact UnsafeRow bytes instead.

Pairs are interleaved (A,B,A,B,...) in ONE JVM so ambient drift hits both
arms equally; per-pair contention canaries make polluted pairs
self-identifying. Run via the babysitter on a clean window:

    tools/bench_babysitter.sh /dev/null true   # (or just check probes)
    python tools/ckpt_level_ab.py 32 16000000 4

Prints one JSON line per pair plus a median summary.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canary() -> dict[str, float]:
    import numpy as np

    t0 = time.time()
    acc = 0
    for i in range(3_000_000):
        acc += i * i
    probe = round((time.time() - t0) * 1000)
    buf = np.ones(32_000_000)
    t0 = time.time()
    assert buf.sum() > 0
    return {"probe_ms": probe, "memstream_mbps": round(256 / (time.time() - t0))}


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import bench
    from bench import _mk_spark
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.functions.urls import url_hash
    from mcp_crawl4ai_rag_spark.operators.urlseen import build_bloom

    spark = _mk_spark(cores)
    parts = bench.SHUFFLE_PARTITIONS
    ser = StorageLevel.MEMORY_AND_DISK  # deserialized=False in PySpark 4

    def urls(ids):
        i = F.col("id")
        host_id = F.when(i % 4 == 0, F.lit(0)).otherwise((i % 1021).cast("int"))
        host = F.concat(F.lit("h"), host_id.cast("string"), F.lit(".example.com"))
        u = F.concat(F.lit("https://"), host, F.lit("/p/"), i.cast("string"))
        return ids.select(
            u.alias("canonical_url"),
            url_hash(u).alias("url_hash"),
            host.alias("host"),
            F.lit("/p/x").alias("path"),
            (F.col("id") % 4).cast("int").alias("depth"),
            F.lit(0).alias("priority"),
            F.col("id").alias("seq"),
        )

    warm = (
        urls(spark.range(0, 200_000, 3, parts))
        .select("url_hash", "canonical_url")
        .localCheckpoint(eager=True)
    )
    build_bloom(warm, "url_hash", expected=70_000)
    warm.unpersist()

    def one(level) -> float:
        fr = urls(spark.range(0, n, 1, parts))
        seen = urls(spark.range(0, n, 3, parts)).select("url_hash", "canonical_url")
        if level is None:
            fr = fr.localCheckpoint(eager=True)
            seen = seen.localCheckpoint(eager=True)
        else:
            fr = fr.localCheckpoint(eager=True, storageLevel=level)
            seen = seen.localCheckpoint(eager=True, storageLevel=level)
        t0 = time.time()
        build_bloom(seen, "url_hash", expected=n // 3)
        t = time.time() - t0
        fr.unpersist()
        seen.unpersist()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return t

    deser_ts, ser_ts = [], []
    for p in range(pairs):
        a = one(None)
        b = one(ser)
        deser_ts.append(a)
        ser_ts.append(b)
        print(
            json.dumps(
                {"pair": p, "cores": cores, "n": n, "bloom_deser_s": round(a, 2),
                 "bloom_ser_s": round(b, 2), **canary()}
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "summary": True,
                "cores": cores,
                "n": n,
                "median_deser_s": round(statistics.median(deser_ts), 2),
                "median_ser_s": round(statistics.median(ser_ts), 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
