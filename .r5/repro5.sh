#!/bin/bash
cd /root/repo
sleep 90
echo "=== [$(date -u +%H:%M:%S)] repro5: contiguous-images fix, fused blocks, timers" >> .r5/ab_campaign.log
BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=2100 BENCH_DEADLINE=2200 \
  BENCH_Q_SEEDS=1 BENCH_DELTA_STEPS=0 BENCH_DELTA_STEPS2=0 BENCH_Q_STEPS=400 BENCH_Q_TIMERS=1 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/repro5_last_good.json \
  timeout 2220 python bench.py > .r5/repro5.out 2> .r5/repro5.err
echo "=== [$(date -u +%H:%M:%S)] repro5 done rc=$?" >> .r5/ab_campaign.log
