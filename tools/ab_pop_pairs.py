"""Interleaved paired A/B: threshold pop vs two-phase pop under ambient load.

The clean-window path (tools/bench_babysitter.sh + the witness-gated
scaling snapshots) is the preferred evidence, but this host takes multi-hour
co-tenant memory-bus pressure with no clean window at all. Absolute numbers
from such periods are worthless; RELATIVE ones need not be, if both arms
sample the same ambient conditions. This harness runs the 16M-URL frontier
epoch (bench.frontier_epoch — the exact job the scaling phase times) in
interleaved pairs:

    pair 1: threshold, twophase        pair 2: twophase, threshold   ...

one fresh JVM per cell (bench hygiene), alternating order each pair so slow
ambient drift cancels instead of biasing one arm, with a contention witness
(busy-probe ms, 256 MB memstream MB/s, 1-min loadavg) sampled immediately
before every cell. Output: per-cell records + per-pair twophase/threshold
ratios + their median. A pair is quotable iff both cells' witnesses are
comparable; the JSON leaves that judgment to the reader by carrying every
witness.

Usage:  python tools/ab_pop_pairs.py [n_pairs] [out.json]
        (defaults: 4 pairs, BENCH/bench_r3_ab_pairs.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: _mk_spark, best_frontier_time)


def witness() -> dict:
    import numpy as np

    t0 = time.time()
    acc = 0
    for i in range(3_000_000):
        acc += i * i
    probe = round((time.time() - t0) * 1000)
    buf = np.ones(32_000_000, dtype=np.float64)  # 256 MB
    t0 = time.time()
    s = float(buf.sum())
    assert s > 0
    mbps = round(256 / (time.time() - t0))
    return {
        "probe_ms": probe,
        "memstream_mbps": mbps,
        "loadavg": round(os.getloadavg()[0], 1),
    }


def run_cell(impl: str) -> dict:
    """One fresh-JVM cell: warmup + best-of-2 frontier epochs at CPUS cores."""
    # env semantics post-verdict (commit 67e76b4): default impl is
    # twophase; "threshold" opts into the broadcast-threshold pop.
    if impl == "threshold":
        os.environ["SPARK_GRAFT_POP_IMPL"] = "threshold"
    else:
        os.environ.pop("SPARK_GRAFT_POP_IMPL", None)
    w = witness()
    spark = bench._mk_spark(bench.CPUS)
    sec, bloom_sec = bench.best_frontier_time(spark, bench.FRONTIER_N)
    spark.stop()
    return {
        "impl": impl,
        "sec": round(sec, 2),
        "bloom_sec": round(bloom_sec, 2),
        "urls_per_sec": round(bench.FRONTIER_N / sec, 1),
        "witness_before": w,
    }


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/bench_r3_ab_pairs.json"

    cells: list[dict] = []
    ratios: list[float] = []
    for p in range(n_pairs):
        order = ("threshold", "twophase") if p % 2 == 0 else ("twophase", "threshold")
        pair: dict[str, dict] = {}
        for impl in order:
            cell = run_cell(impl)
            cell["pair"] = p
            cells.append(cell)
            pair[impl] = cell
            print(
                f"pair {p} {impl}: {cell['sec']}s "
                f"(bloom {cell['bloom_sec']}s, witness {cell['witness_before']})",
                flush=True,
            )
        ratios.append(round(pair["twophase"]["sec"] / pair["threshold"]["sec"], 3))

    ratios_sorted = sorted(ratios)
    mid = len(ratios_sorted) // 2
    median_ratio = (
        ratios_sorted[mid]
        if len(ratios_sorted) % 2
        else round((ratios_sorted[mid - 1] + ratios_sorted[mid]) / 2, 3)
    )
    out = {
        "design": "interleaved pairs, alternating order, fresh JVM per cell, "
        "best-of-2 epochs after warmup, witness before every cell",
        "job": f"frontier_epoch n={bench.FRONTIER_N} at local[{bench.CPUS}]",
        "cells": cells,
        "pair_ratios_twophase_over_threshold": ratios,
        "median_ratio": median_ratio,
        "witness_after": witness(),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"median_ratio": median_ratio, "ratios": ratios}))


if __name__ == "__main__":
    main()
