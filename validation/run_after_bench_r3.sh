#!/bin/bash
# Round-3 session-5 stage 3: after the star-small watchdog AND the
# bench re-warm have both finished, re-validate the travis CI example
# on the real TPU at HEAD.  Round 3 changed step physics (per-row
# source dtime, MaxGasVel cap, stencil SPH defaults), so the round-2
# 8/8 PASS (validation/RESULT_travis_r2.txt) needs re-earning.
# Usage: setsid nohup bash validation/run_after_bench_r3.sh \
#          < /dev/null > /root/repo/.work/after_bench.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_ENABLE_COMPILATION_CACHE=true
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

echo "[$(stamp)] waiting for the after-ss bench queue to finish"
deadline=$(( $(date +%s) + 21600 ))   # give up after 6 h: if the
while true; do                        # upstream queue died (or a
  if grep -q "after-ss queue done" .work/after_ss.log 2>/dev/null; then
    break                             # reboot wiped its log) don't
  fi                                  # spin as a zombie poller
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(stamp)] after-ss queue never finished within 6h - abort"
    exit 1
  fi
  sleep 120
done

if ! timeout 300 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
(jnp.ones((64,64)) @ jnp.ones((64,64))).block_until_ready()
print('TPU OK')" 2>&1 | grep -q 'TPU OK'; then
  echo "[$(stamp)] TPU unhealthy - abort travis revalidation"
  exit 1
fi

echo "[$(stamp)] running travis validation at HEAD"
timeout 14400 python validation/travis.py /root/repo/.work/travis_r3 \
  > .work/travis_r3.log 2>&1
rc=$?
if [ -f /root/repo/.work/travis_r3/RESULT.txt ]; then
  cp /root/repo/.work/travis_r3/RESULT.txt \
     validation/RESULT_travis_r3.txt
  echo "[$(stamp)] RESULT copied (rc=$rc)"
  tail -12 validation/RESULT_travis_r3.txt
else
  echo "[$(stamp)] no RESULT (rc=$rc); log tail:"
  tail -5 .work/travis_r3.log
fi
echo "[$(stamp)] after-bench queue done"
