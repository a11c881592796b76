#!/bin/bash
# star-small watchdog v3 (round-3 session 5).
#
# The axon TPU tunnel wedges SILENTLY under sustained load (r3e died
# mid-trace at step 46, r3f froze at step 38 with the main thread in
# futex_wait and the net thread in epoll for 25+ min) — no error ever
# surfaces, so exit-code-driven retries are not enough.  This version:
#   * runs the validation in ONE persistent workdir,
#   * watches the log mtime and KILLS the run (by recorded PID — never
#     by pattern) when it goes stale,
#   * relaunches; validation/star_small.py auto-RESUMES from the last
#     snapshot (dense OutputList = resume points every ~20-30 min).
# A physics failure (bad timestep) stops the loop for analysis.
#
# Usage: setsid nohup bash validation/run_star_small_watchdog.sh \
#          < /dev/null > /tmp/ss_watchdog3.log 2>&1 &
set -u
cd /root/repo
# advertise this process group as the TPU holder: bench.py (the
# driver's artifact of record) kills the whole group via this file if
# it finds the chip held during its window (round-3 rc=124 lesson)
mkdir -p /root/repo/.work
echo $$ > /root/repo/.work/tpu_holder.pid
trap 'rm -f /root/repo/.work/tpu_holder.pid' EXIT
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_ENABLE_COMPILATION_CACHE=true
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
# round-5: trace OFF for production — the per-step trace pulls
# ~10 full arrays over the tunnel (seconds/step); forensics are
# done offline from snapshots now

WORK=${WORK:-/root/repo/.work/star_small_r4}
STALE_S=1500          # kill after 25 min of log silence (cold step-0
                      # compile is ~13 min; resumes hit the jax cache)
MAX_ATTEMPTS=16

stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

for attempt in $(seq 1 $MAX_ATTEMPTS); do
  # ---- wait for a healthy tunnel ----
  ok=0
  for i in $(seq 1 24); do
    if timeout 300 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
(jnp.ones((64,64)) @ jnp.ones((64,64))).block_until_ready()
print('TPU OK')" 2>&1 | grep -q 'TPU OK'; then ok=1; break; fi
    echo "[$(stamp)] tpu not healthy (probe $i/24)"
    sleep 60
  done
  if [ $ok -ne 1 ]; then
    echo "[$(stamp)] no healthy TPU after 24 probes (attempt $attempt)"
    continue
  fi

  log=$WORK.r5attempt$attempt.log
  echo "[$(stamp)] attempt $attempt: star-small -> $WORK (log $log)"
  python validation/star_small.py "$WORK" > "$log" 2>&1 &
  pid=$!
  echo $pid > /tmp/ss_run.pid

  # ---- monitor: done, died, or stale ----
  while true; do
    sleep 60
    if ! kill -0 $pid 2>/dev/null; then break; fi
    now=$(date +%s)
    mt=$(stat -c %Y "$log" 2>/dev/null || echo $now)
    # round-5: the per-step trace is off, so the attempt log goes
    # silent on a healthy run — the real heartbeat is cpu.txt, which
    # on_step appends every step
    mt2=$(stat -c %Y "$WORK/output/cpu.txt" 2>/dev/null || echo 0)
    [ "$mt2" -gt "$mt" ] && mt=$mt2
    if [ $((now - mt)) -gt $STALE_S ]; then
      echo "[$(stamp)] log stale $((now - mt))s — killing wedged run"
      kill $pid 2>/dev/null; sleep 10
      kill -9 $pid 2>/dev/null
      break
    fi
  done
  wait $pid 2>/dev/null; rc=$?
  echo "[$(stamp)] attempt $attempt ended rc=$rc"

  if [ -f "$WORK/RESULT.txt" ]; then
    cp "$WORK/RESULT.txt" validation/RESULT_star_small_r5.txt
    echo "[$(stamp)] RESULT copied to validation/ (rc=$rc)"
    break
  fi
  if grep -q 'bad timesteps at step' "$log"; then
    echo "[$(stamp)] physics failure; stopping for analysis"
    tail -5 "$log"
    break
  fi
  echo "[$(stamp)] tunnel wedge/death; will resume from last snapshot"
done
echo "[$(stamp)] watchdog done"
