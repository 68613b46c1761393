#!/bin/bash
cd /root/repo
sleep 60
echo "=== [$(date -u +%H:%M:%S)] repro1: throughput+quality s0 only, phase-clear ON" >> .r5/ab_campaign.log
BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=2100 BENCH_DEADLINE=2200 \
  BENCH_Q_SEEDS=1 BENCH_DELTA_STEPS=0 BENCH_DELTA_STEPS2=0 BENCH_Q_STEPS=400 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/repro1_last_good.json \
  timeout 2220 python bench.py > .r5/repro1.out 2> .r5/repro1.err
echo "=== [$(date -u +%H:%M:%S)] repro1 done rc=$?" >> .r5/ab_campaign.log
