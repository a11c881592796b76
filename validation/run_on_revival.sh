#!/bin/bash
# Serialized TPU work queue for when the axon tunnel revives.
# Usage: setsid nohup bash validation/run_on_revival.sh < /dev/null \
#          > /tmp/revival.log 2>&1 &
# One TPU job at a time (axon allows a single client); each stage
# logs separately and the queue stops on tunnel death (next stage
# would hang, so every stage is under timeout).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_ENABLE_COMPILATION_CACHE=true
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

echo "[$(stamp)] revival queue start"

# health check first (wedged-tunnel lesson: trivial op, can take 2 min)
if ! timeout 300 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
(jnp.ones((64,64)) @ jnp.ones((64,64))).block_until_ready()
print('TPU OK')" 2>&1 | grep -q 'TPU OK'; then
  echo "[$(stamp)] health check FAILED - abort queue"
  exit 1
fi
echo "[$(stamp)] health check OK"

# stage 1: star-small full-physics validation (VERDICT #3) ~1-3 h
echo "[$(stamp)] stage 1: star-small"
timeout 21600 python validation/star_small.py /tmp/star_small_r3 \
  > /tmp/star_small_r3.log 2>&1
s1=$?
if [ -f /tmp/star_small_r3/RESULT.txt ]; then
  cp /tmp/star_small_r3/RESULT.txt validation/RESULT_star_small_r3.txt
fi
echo "[$(stamp)] stage 1 exit=$s1"

# stage 2: bench (fused megastep) ~20-40 min with cold compiles
echo "[$(stamp)] stage 2: bench"
timeout 7200 python bench.py > /tmp/bench_r3.log 2>&1
echo "[$(stamp)] stage 2 exit=$? tail:"
tail -3 /tmp/bench_r3.log

# stage 3: dm-small seeds study (VERDICT #8), 3 seeds ~1-2 h
echo "[$(stamp)] stage 3: dm-small seeds"
timeout 14400 python validation/dm_small_seeds.py /tmp/dm_small_seeds 3 \
  > /tmp/dm_small_seeds.log 2>&1
s3=$?
if [ -f /tmp/dm_small_seeds/RESULT.txt ]; then
  cp /tmp/dm_small_seeds/RESULT.txt validation/RESULT_dm_small_seeds_r3.txt
fi
echo "[$(stamp)] stage 3 exit=$s3"

echo "[$(stamp)] revival queue done"
