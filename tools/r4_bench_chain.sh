#!/bin/bash
# Round-4 post-fix measurement chain: waits for clean windows and takes, in
# order, (1) the scaling snapshot (frontier/kernel N-vs-4N cells + the 10x
# compose cell, post explode-replication fix), (2) the per-query snapshot.
# Each step reuses bench_babysitter.sh's clean-window gating; a step that
# cannot land before END_TS is skipped so later steps still get a chance.
set -u
cd "$(dirname "$0")/.."
END_TS=$(( $(date +%s) + ${CHAIN_MAX_S:-12600} ))

left() { echo $(( END_TS - $(date +%s) )); }

if [ ! -s BENCH/bench_r4_scaling_postfix.json ] && [ "$(left)" -gt 600 ]; then
  BABYSIT_MAX_S=$(( $(left) - 2400 > 600 ? $(left) - 2400 : 600 )) \
    tools/bench_babysitter.sh BENCH/bench_r4_scaling_postfix.json SPARK_GRAFT_PHASES=scaling
fi
if [ ! -s BENCH/bench_r4_queries_postfix.json ] && [ "$(left)" -gt 600 ]; then
  BABYSIT_MAX_S=$(left) \
    tools/bench_babysitter.sh BENCH/bench_r4_queries_postfix.json SPARK_GRAFT_PHASES=queries
fi
echo "chain done at $(date +%H:%M:%S)"
