"""Drill into per-stage task skew for one composed gate at N× scale.

bench.py's compose cell reports only the WORST max/median ratio; when that
witness trips (r4: pipeline_e2e stage 330 read 8.26x at 10x), this tool
re-runs the same gate under the same UI session and prints EVERY heavy
stage with its name, task quantiles, GC time, and shuffle/input volume so
the skew can be attributed to a plan stage instead of guessed at.

Usage: python tools/skew_drill.py [gate] [mult] [cores]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    gate = sys.argv[1] if len(sys.argv) > 1 else "pipeline_e2e"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import bench
    import __spark_entry__ as E
    from mcp_crawl4ai_rag_spark.sources.corpus import materialized_pages

    spark = bench._mk_spark_ui(cores)
    os.environ["SPARK_GRAFT_N_MULT"] = str(mult)
    os.environ["SPARK_GRAFT_DOCS_MULT"] = str(mult)
    try:
        n = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count() * mult
        materialized_pages(spark, n).count()  # warm the corpus cache
        q = E.queries()[gate]
        # cold run to amortize codegen, as the bench does
        t0 = time.time()
        q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        spark.catalog.clearCache()
        wm = bench._max_stage_id(spark)
        t0 = time.time()
        q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        warm = time.time() - t0
        print(f"{gate} x{mult} local[{cores}]: cold={cold:.2f}s warm={warm:.2f}s")

        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
        )
        rows = []
        for s in stages:
            if s["stageId"] < wm or s.get("numCompleteTasks", 0) < 8:
                continue
            qs = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
                    f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
                )
            )
            med, mx = qs["duration"][0], qs["duration"][1]
            if med < 200.0:
                continue
            rows.append({
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "med_ms": int(med),
                "max_ms": int(mx),
                "ratio": round(mx / max(med, 1.0), 2),
                "gc_med_ms": int(qs["jvmGcTime"][0]),
                "gc_max_ms": int(qs["jvmGcTime"][1]),
                "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "name": s.get("name", "")[:80],
            })
        rows.sort(key=lambda r: -r["ratio"])
        for r in rows:
            print(json.dumps(r))
    finally:
        os.environ.pop("SPARK_GRAFT_N_MULT", None)
        os.environ.pop("SPARK_GRAFT_DOCS_MULT", None)
        spark.stop()


if __name__ == "__main__":
    main()
