#!/bin/bash
# Round-3 session-5 follow-up queue: wait for the star-small watchdog
# to finish (it owns the TPU), then run bench.py.  The 04:05 UTC host
# reboot wiped .jax_cache, so this run re-warms the compile cache and
# records the headline number ahead of the driver's round-end bench.
# Usage: setsid nohup bash validation/run_after_ss_r3.sh < /dev/null \
#          > /root/repo/.work/after_ss.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_ENABLE_COMPILATION_CACHE=true
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

echo "[$(stamp)] waiting for star-small watchdog to release the TPU"
while true; do
  if grep -q "watchdog done" .work/ss_watchdog.log 2>/dev/null; then
    break
  fi
  sleep 120
done
echo "[$(stamp)] watchdog finished; running bench"
timeout 10800 python bench.py > .work/bench_r3s5.log 2>&1
echo "[$(stamp)] bench exit=$? tail:"
tail -3 .work/bench_r3s5.log
echo "[$(stamp)] after-ss queue done"
