#!/bin/bash
# Post-round-4 continuation queue.
#
# At round end the driver runs bench.py, which kills the star-small
# watchdog via .work/tpu_holder.pid (by design: the bench is the
# artifact of record).  This script waits for that to happen, gives
# the bench a generous window, then (1) restarts the star-small
# watchdog — validation/star_small.py RESUMES from the last snapshot
# — and (2) once star-small finishes or stops, re-certifies travis at
# HEAD (the round-4 kick-time fix changed step physics, so the
# RESULT_travis_r4.txt 8/8 from the pre-fix HEAD needs a re-run).
#
# Usage: setsid nohup bash validation/run_after_bench_r4.sh \
#          < /dev/null > /root/repo/.work/after_bench_r4.log 2>&1 &
set -u
cd /root/repo
stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

WD_PID=$(cat .work/tpu_holder.pid 2>/dev/null || echo "")
echo "[$(stamp)] waiting for the driver bench to reclaim the chip"
deadline=$(( $(date +%s) + 28800 ))   # give up after 8 h
while true; do
  if [ -n "$WD_PID" ] && ! kill -0 "$WD_PID" 2>/dev/null; then
    echo "[$(stamp)] watchdog pgid $WD_PID gone (bench reclaim)"
    break
  fi
  if [ -z "$WD_PID" ]; then
    echo "[$(stamp)] no holder pidfile; assuming bench window now"
    break
  fi
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(stamp)] watchdog still alive after 8h; exiting"
    exit 1
  fi
  sleep 120
done

# bench window: BENCH_TOTAL_SECONDS defaults to 1200 s + compile
# slack; wait 40 min before touching the chip again
echo "[$(stamp)] sleeping 40 min for the bench window"
sleep 2400

echo "[$(stamp)] restarting the star-small watchdog (resume)"
setsid bash validation/run_star_small_watchdog.sh \
  < /dev/null > /root/repo/.work/ss_watchdog_r4b.log 2>&1
echo "[$(stamp)] watchdog returned; star-small final state:"
tail -3 .work/star_small_r4/RESULT.txt 2>/dev/null || \
  echo "  (no RESULT.txt yet)"

echo "[$(stamp)] travis re-certification at post-fix HEAD"
if timeout 300 python -c "
import jax
assert jax.devices()[0].platform == 'tpu'
import jax.numpy as jnp
(jnp.ones((64,64)) @ jnp.ones((64,64))).block_until_ready()
print('TPU OK')" 2>&1 | grep -q 'TPU OK'; then
  rm -rf /root/repo/.work/travis_r4
  timeout 14400 python validation/travis.py /root/repo/.work/travis_r4
  if [ -f /root/repo/.work/travis_r4/RESULT.txt ]; then
    { echo "# travis at post-kick-fix HEAD ($(git rev-parse --short HEAD))";
      cat /root/repo/.work/travis_r4/RESULT.txt; } \
      > validation/RESULT_travis_r4_postfix.txt
    echo "[$(stamp)] travis result recorded"
  fi
else
  echo "[$(stamp)] TPU unhealthy; skipping travis"
fi
echo "[$(stamp)] after-bench queue done"
