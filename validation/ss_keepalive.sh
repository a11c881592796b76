#!/bin/bash
# Keepalive for the star-small watchdog's stale detector: the per-step
# trace is off, so long compile phases produce no log/cpu.txt output.
# Touch the attempt log ONLY while the run process is actually
# accruing CPU time (a wedged tunnel run sits in futex_wait at ~0%).
while true; do
  pid=$(cat /tmp/ss_run.pid 2>/dev/null)
  if [ -n "$pid" ] && [ -d /proc/$pid ]; then
    u1=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null || echo 0)
    sleep 120
    u2=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null || echo 0)
    # >2 s of CPU in 2 min = alive (compiling or stepping)
    if [ $((u2 - u1)) -gt 200 ]; then
      log=$(ls -t /root/repo/.work/star_small_r4.r5attempt*.log 2>/dev/null | head -1)
      [ -n "$log" ] && touch -c "$log"
    fi
  else
    sleep 60
  fi
done
