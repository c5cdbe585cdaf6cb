#!/bin/bash
# Round-5 measurement chain: clean-window snapshots in priority order —
# (1) the scaling phase (frontier/kernel N-vs-4N + 10x compose cells),
# (2) the 104-leg per-query snapshot (incl. the five new r5 cells:
#     crawl_stored, drain_stored, crawl_hardened, extraction_quality,
#     plus the grown gate cells),
# (3) the DEEP INPUT LADDER with spill instrumentation
#     (tools/ladder_deep.py): 64M and 256M re-based under the r5
#     compressed-checkpoint config for in-family comparability, then the
#     1B rung — the first rung where the 128 GiB box must show its spill
#     machinery (REST memory/disk spill bytes recorded either way).
# Each step reuses bench_babysitter.sh clean-window gating where it runs
# bench.py; ladder rungs gate on one clean probe each (they are single
# fresh-JVM cells with their own disk guard).
set -u
cd "$(dirname "$0")/.."
END_TS=$(( $(date +%s) + ${CHAIN_MAX_S:-14400} ))

left() { echo $(( END_TS - $(date +%s) )); }

probe_clean() {
python - <<'PY'
import time, sys
import numpy as np
t0 = time.time(); acc = 0
for j in range(3_000_000):
    acc += j * j
probe = (time.time() - t0) * 1000
buf = np.ones(32_000_000)
t0 = time.time(); s = buf.sum()
mbps = 256 / (time.time() - t0)
print(f"{time.strftime('%H:%M:%S')} probe={probe:.0f}ms mem={mbps:.0f}MB/s", flush=True)
sys.exit(0 if (probe < 400 and mbps > 8000) else 1)
PY
}

wait_one_clean() {
  while [ "$(date +%s)" -lt "$END_TS" ]; do
    probe_clean && return 0
    sleep 60
  done
  return 1
}

if [ ! -s BENCH/bench_r5_scaling.json ] && [ "$(left)" -gt 600 ]; then
  BABYSIT_MAX_S=$(( $(left) / 3 > 600 ? $(left) / 3 : 600 )) \
    tools/bench_babysitter.sh BENCH/bench_r5_scaling.json SPARK_GRAFT_PHASES=scaling
fi
if [ ! -s BENCH/bench_r5_queries.json ] && [ "$(left)" -gt 600 ]; then
  BABYSIT_MAX_S=$(( $(left) / 2 > 600 ? $(left) / 2 : 600 )) \
    tools/bench_babysitter.sh BENCH/bench_r5_queries.json SPARK_GRAFT_PHASES=queries
fi

LADDER_OUT=BENCH/bench_r5_ladder_deep.jsonl
for N in 64000000 256000000 1000000000; do
  grep -q "\"n\": $N" "$LADDER_OUT" 2>/dev/null && continue
  [ "$(left)" -gt 900 ] || break
  wait_one_clean || break
  echo "ladder rung n=$N at $(date +%H:%M:%S)"
  python tools/ladder_deep.py "$N" "$LADDER_OUT" || true
done
echo "r5 chain done at $(date +%H:%M:%S)"
