"""Deep input-size ladder rung with SPILL instrumentation (r5 ask #6).

Runs ONE frontier-epoch ladder rung (bench.py frontier_epoch — the exact
cell definition of the input ladder) at a given N in a fresh JVM, with:

* ``spark.local.dir`` on REAL DISK (/tmp) instead of /dev/shm — at the
  1B rung the materialized frontier (~100 GB serialized) plus shuffle
  cannot share the 126 GiB tmpfs with the JVM heap; this is also the
  honest cluster shape (NVMe shuffle dirs, not RAM);
* ``spark.rdd.compress=true`` — checkpointed URL rows compress ~3-4×
  (lz4), exactly what a 10^10 deployment would run; the r5 ladder is
  therefore labeled compressed-checkpoint and re-runs the smaller rungs
  for in-family comparability (r4 rungs are NOT 1:1 comparable);
* the Spark UI enabled and the REST API scraped after the run for the
  spill story the judge asked for: memory/disk bytes spilled, peak
  execution memory, shuffle bytes, GC time;
* a disk guard that stops the JVM if /tmp free space drops under the
  floor — a failed rung reports as a labeled failure, never a wedged box.

Usage:  python tools/ladder_deep.py <n_urls> [out.jsonl]
Appends one JSON line per invocation (rung record or failure record).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py — reuses the cell definition)

DISK_FLOOR_GB = 6
LOCAL_DIR = "/tmp/spark-ladder-deep"


def _mk_spark(cores: int, driver_mem: str):
    from mcp_crawl4ai_rag_spark import get_spark

    os.makedirs(LOCAL_DIR, exist_ok=True)
    spark = get_spark(
        app_name=f"ladder-deep-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=bench.SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.local.dir": LOCAL_DIR,
            "spark.driver.memory": driver_mem,
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
            "spark.rdd.compress": "true",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "2000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _rest_metrics(spark) -> dict:
    """Spill/memory story from the REST API, summed over all stages."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30,
        ) as r:
            stages = json.load(r)
    except Exception as exc:  # REST gone — report why, keep the timing
        return {"rest_error": repr(exc)}
    out = {
        "n_stages": len(stages),
        "memory_spilled_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spilled_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "peak_execution_memory": max(
            (s.get("peakExecutionMemory", 0) for s in stages), default=0
        ),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "executor_run_time_ms": sum(s.get("executorRunTime", 0) for s in stages),
        "jvm_gc_time_ms": sum(s.get("jvmGcTime", 0) for s in stages),
    }
    return out


def main() -> None:
    n = int(float(sys.argv[1]))
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/bench_r5_ladder_deep.jsonl"
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "96g")
    reps = int(os.environ.get("SPARK_GRAFT_LADDER_REPS", "2"))

    from mcp_crawl4ai_rag_spark.operators.urlseen import BloomFilter

    proto = BloomFilter.sized_for(max(n // 3, 1), 0.01)
    rec: dict = {
        "n": n,
        "cores": bench.CPUS,
        "driver_mem": driver_mem,
        "rdd_compress": True,
        "local_dir": LOCAL_DIR,
        "bloom_bits": int(proto.m),
        "bloom_bytes": int(proto.m // 8),
        "bloom_hashes": int(proto.k),
    }

    stop = threading.Event()
    tripped = threading.Event()
    spark_box: list = []

    def guard():
        while not stop.wait(5):
            free_gb = shutil.disk_usage("/tmp").free / 2**30
            if free_gb < DISK_FLOOR_GB:
                tripped.set()
                if spark_box:
                    try:
                        spark_box[0].stop()
                    except Exception:
                        pass
                return

    th = threading.Thread(target=guard, daemon=True)
    th.start()
    t_start = time.time()
    try:
        spark = _mk_spark(bench.CPUS, driver_mem)
        spark_box.append(spark)
        # warm (JIT/codegen) at 1/8 scale, then best-of-reps — the exact
        # best_frontier_time protocol of the r3/r4 ladders
        bench.frontier_epoch(spark, max(n // 8, 100_000))
        best = min(
            (bench.frontier_epoch(spark, n) for _ in range(reps)),
            key=lambda t: t[1],
        )
        rec.update(
            {
                "sec": round(best[1], 2),
                "bloom_sec": round(best[2], 2),
                "urls_per_sec": round(n / best[1], 1),
                "reps": reps,
            }
        )
        rec["rest"] = _rest_metrics(spark)
        spark.stop()
    except Exception as exc:
        rec["failed"] = repr(exc)[:500]
        rec["disk_guard_tripped"] = tripped.is_set()
        rec["elapsed_at_failure"] = round(time.time() - t_start, 1)
    finally:
        stop.set()
        rec["tmp_free_gb_end"] = round(shutil.disk_usage("/tmp").free / 2**30, 1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
