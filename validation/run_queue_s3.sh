#!/bin/bash
# Round-3 session-3 serialized TPU queue (tunnel revived 2026-08-19).
# Order chosen so the most important artifacts land first in case the
# tunnel wedges again: bench (headline number) -> engine timing
# (pallas/mxu decision) -> star-small (longest) -> dm-small seeds.
# Usage: setsid nohup bash validation/run_queue_s3.sh < /dev/null \
#          > /tmp/queue_s3.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_ENABLE_COMPILATION_CACHE=true
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

echo "[$(stamp)] queue s3 start"

# stage 1: bench (fused megastep, xla engine) ~20-40 min
echo "[$(stamp)] stage 1: bench"
timeout 7200 python bench.py > /tmp/bench_r3s3.log 2>&1
echo "[$(stamp)] stage 1 exit=$? tail:"
tail -3 /tmp/bench_r3s3.log

# stage 2: engine timing (xla / pallas / mxu decision) ~1 h cached
echo "[$(stamp)] stage 2: engine timing"
timeout 9000 python validation/engine_timing.py \
  validation/RESULT_engine_timing_r3.txt > /tmp/engine_timing_r3.log 2>&1
echo "[$(stamp)] stage 2 exit=$? tail:"
tail -6 /tmp/engine_timing_r3.log

# stage 3: star-small full-physics validation (VERDICT #3)
echo "[$(stamp)] stage 3: star-small"
timeout 21600 python validation/star_small.py /tmp/star_small_r3 \
  > /tmp/star_small_r3.log 2>&1
s3=$?
if [ -f /tmp/star_small_r3/RESULT.txt ]; then
  cp /tmp/star_small_r3/RESULT.txt validation/RESULT_star_small_r3.txt
fi
echo "[$(stamp)] stage 3 exit=$s3"

# stage 4: dm-small seeds study (VERDICT #8), 3 seeds
echo "[$(stamp)] stage 4: dm-small seeds"
timeout 14400 python validation/dm_small_seeds.py /tmp/dm_small_seeds 3 \
  > /tmp/dm_small_seeds.log 2>&1
s4=$?
if [ -f /tmp/dm_small_seeds/RESULT.txt ]; then
  cp /tmp/dm_small_seeds/RESULT.txt validation/RESULT_dm_small_seeds_r3.txt
fi
echo "[$(stamp)] stage 4 exit=$s4"

echo "[$(stamp)] queue s3 done"
