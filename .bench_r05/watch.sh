#!/bin/bash
# Poll the tunnel; tiered response:
#   probe < 80 ms  -> full healthy battery (headline + live p50/p95 + retry mix)
#   probe < 250 ms -> one bench-only snapshot (better than the ~490 ms rows)
cd /root/repo
ran_dip=0
for i in $(seq 1 24); do
  ms=$(timeout 180 python .bench_r05/probe.py 2>/dev/null | tail -1)
  echo "$(date +%H:%M:%S) probe ${ms:-timeout} ms" >> .bench_r05/watch.log
  if [ -n "$ms" ] && [ "$ms" -lt 80 ] 2>/dev/null; then
    echo "$(date +%H:%M:%S) HEALTHY -> battery" >> .bench_r05/watch.log
    timeout 1200 python bench.py > .bench_r05/bench_healthy.txt 2>&1
    timeout 1200 python scripts/bench_live.py --caller synth48 > .bench_r05/live_healthy.txt 2>&1
    timeout 1200 python scripts/bench_live.py --caller synth48 --random-frac 0.3 > .bench_r05/live_rand_healthy.txt 2>&1
    echo "$(date +%H:%M:%S) battery done" >> .bench_r05/watch.log
    exit 0
  fi
  if [ -n "$ms" ] && [ "$ms" -lt 250 ] 2>/dev/null && [ "$ran_dip" -eq 0 ]; then
    echo "$(date +%H:%M:%S) DIP -> bench snapshot" >> .bench_r05/watch.log
    timeout 1200 python bench.py > .bench_r05/bench_dip.txt 2>&1
    ran_dip=1
    echo "$(date +%H:%M:%S) dip snapshot done" >> .bench_r05/watch.log
  fi
  sleep 600
done
echo "$(date +%H:%M:%S) watch window over" >> .bench_r05/watch.log
