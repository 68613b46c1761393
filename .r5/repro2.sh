#!/bin/bash
cd /root/repo
sleep 60
echo "=== [$(date -u +%H:%M:%S)] repro2: quality-only (BENCH_THROUGHPUT=0) s0, 400 steps" >> .r5/ab_campaign.log
BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=2000 BENCH_DEADLINE=2100 \
  BENCH_THROUGHPUT=0 BENCH_Q_SEEDS=1 BENCH_DELTA_STEPS=0 BENCH_DELTA_STEPS2=0 BENCH_Q_STEPS=400 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/repro2_last_good.json \
  timeout 2120 python bench.py > .r5/repro2.out 2> .r5/repro2.err
echo "=== [$(date -u +%H:%M:%S)] repro2 done rc=$?" >> .r5/ab_campaign.log
