#!/bin/bash
# Round-3 post-fix measurement chain: waits for clean windows and takes, in
# order, (1) the scaling snapshot, (2) the per-query snapshot, (3) the
# checkpoint-storage-level A/B. Each step reuses bench_babysitter.sh's
# clean-window gating; a step that cannot land before END_TS is skipped so
# later steps still get a chance.
set -u
cd "$(dirname "$0")/.."
END_TS=$(( $(date +%s) + ${CHAIN_MAX_S:-12600} ))

left() { echo $(( END_TS - $(date +%s) )); }

if [ ! -s BENCH/bench_r3_scaling_postfix.json ] && [ "$(left)" -gt 600 ]; then
  BABYSIT_MAX_S=$(( $(left) - 2400 > 600 ? $(left) - 2400 : 600 )) \
    tools/bench_babysitter.sh BENCH/bench_r3_scaling_postfix.json SPARK_GRAFT_PHASES=scaling
fi
if [ ! -s BENCH/bench_r3_queries_postfix.json ] && [ "$(left)" -gt 600 ]; then
  BABYSIT_MAX_S=$(left) \
    tools/bench_babysitter.sh BENCH/bench_r3_queries_postfix.json SPARK_GRAFT_PHASES=queries
fi
if [ "$(left)" -gt 900 ]; then
  python tools/ckpt_level_ab.py 32 16000000 3 > BENCH/ckpt_level_ab_32.json 2>/dev/null
fi
echo "chain done at $(date +%H:%M:%S)"
