#!/bin/bash
# star-small watchdog (round-3 session 4): wait for a healthy TPU
# tunnel, run the validation from scratch, and retry ONLY on tunnel
# death (UNAVAILABLE / worker crash).  A physics failure (bad
# timestep) stops the loop so the TIMESTEP-DUMP can be analyzed.
# Usage: setsid nohup bash validation/run_star_small_watchdog.sh \
#          < /dev/null > /tmp/ss_watchdog.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_ENABLE_COMPILATION_CACHE=true
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
# forensics: per-step trace of the known runaway pair + neighbour
export SHENQI_TRACE_IDS=441802,441738,441737

stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

for attempt in 1 2 3; do
  ok=0
  for i in $(seq 1 24); do           # wait up to ~2.4 h per attempt
    if timeout 300 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
(jnp.ones((64,64)) @ jnp.ones((64,64))).block_until_ready()
print('TPU OK')" 2>&1 | grep -q 'TPU OK'; then ok=1; break; fi
    echo "[$(stamp)] tpu not healthy (probe $i/24)"
    sleep 60
  done
  if [ $ok -ne 1 ]; then
    echo "[$(stamp)] giving up waiting for TPU (attempt $attempt)"
    continue
  fi
  work=/tmp/star_small_r3f_$attempt
  rm -rf "$work"
  echo "[$(stamp)] attempt $attempt: star-small -> $work"
  timeout 28800 python validation/star_small.py "$work" \
      > "$work.log" 2>&1
  rc=$?
  echo "[$(stamp)] attempt $attempt exit=$rc"
  if [ -f "$work/RESULT.txt" ]; then
    cp "$work/RESULT.txt" validation/RESULT_star_small_r3.txt
    echo "[$(stamp)] RESULT copied to validation/ (exit=$rc)"
    break
  fi
  if ! grep -q 'UNAVAILABLE\|worker process crashed\|DEADLINE_EXCEEDED' \
       "$work.log"; then
    echo "[$(stamp)] non-tunnel failure; stopping for analysis"
    tail -5 "$work.log"
    break
  fi
  echo "[$(stamp)] tunnel death detected; will retry"
done
echo "[$(stamp)] watchdog done"
