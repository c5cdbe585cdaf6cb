"""Diagnose the bloom-build inverse-scaling anomaly seen in
BENCH/bench_r3_scaling_clean.json (bloom_sec_lo 2.0 vs bloom_sec_hi 18.0).

Runs ONLY the frontier-epoch bloom phase at one parallelism level in this
process's fresh JVM, with per-rep phase splits and GC telemetry, so the 8-
vs 32-core delta can be attributed (task time vs driver merge vs JVM GC vs
python-worker spin-up).

Usage: python tools/bloom_probe.py <cores> [n=16000000] [reps=3]
Prints one JSON line per rep plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark import StorageLevel as _SL

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import bench
    from bench import _mk_spark
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.functions.urls import url_hash
    from mcp_crawl4ai_rag_spark.operators.urlseen import build_bloom

    spark = _mk_spark(cores)
    sc = spark.sparkContext

    def gc_ms() -> int:
        # total GC time across the local executor's JVM (driver == executor)
        beans = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        total = 0
        it = beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return int(total)

    parts = bench.SHUFFLE_PARTITIONS

    def urls(ids):
        i = F.col("id")
        host_id = F.when(i % 4 == 0, F.lit(0)).otherwise((i % 1021).cast("int"))
        host = F.concat(F.lit("h"), host_id.cast("string"), F.lit(".example.com"))
        u = F.concat(F.lit("https://"), host, F.lit("/p/"), i.cast("string"))
        return ids.select(
            u.alias("canonical_url"),
            url_hash(u).alias("url_hash"),
            host.alias("host"),
        )

    # tiny warmup (JIT, Arrow, python workers)
    warm = urls(spark.range(0, 200_000, 3, parts)).select("url_hash", "canonical_url")
    warm = warm.localCheckpoint(eager=True, storageLevel=_SL.MEMORY_AND_DISK)
    build_bloom(warm, "url_hash", expected=70_000)
    warm.unpersist()

    for rep in range(reps):
        t0 = time.time()
        frontier = urls(spark.range(0, n, 1, parts)).localCheckpoint(eager=True, storageLevel=_SL.MEMORY_AND_DISK)
        url_seen = (
            urls(spark.range(0, n, 3, parts))
            .select("url_hash", "canonical_url")
            .localCheckpoint(eager=True, storageLevel=_SL.MEMORY_AND_DISK)
        )
        t_ckpt = time.time() - t0

        g0 = gc_ms()
        t0 = time.time()
        bloom = build_bloom(url_seen, "url_hash", expected=n // 3)
        t_bloom = time.time() - t0
        g_bloom = gc_ms() - g0

        # split the bloom into its two sub-phases for one extra rep of detail:
        # (a) the mapInPandas fold+collect, (b) driver OR-merge is inside
        # build_bloom; instead re-run just a count() over the coalesced scan
        # to price the scan/Arrow side without the fold.
        t0 = time.time()
        url_seen.select("url_hash").coalesce(16).count()
        t_scan = time.time() - t0

        print(
            json.dumps(
                {
                    "rep": rep,
                    "cores": cores,
                    "n": n,
                    "ckpt_sec": round(t_ckpt, 2),
                    "bloom_sec": round(t_bloom, 2),
                    "bloom_gc_ms": g_bloom,
                    "coalesced_scan_sec": round(t_scan, 2),
                    "bloom_m_bits": bloom.m,
                }
            ),
            flush=True,
        )
        frontier.unpersist()
        url_seen.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
