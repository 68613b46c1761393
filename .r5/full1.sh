#!/bin/bash
cd /root/repo
sleep 30
echo "=== [$(date -u +%H:%M:%S)] full bench 1 (defaults)" >> .r5/ab_campaign.log
BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=3300 BENCH_DEADLINE=3400 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/full1_last_good.json \
  timeout 3420 python bench.py > .r5/full1.out 2> .r5/full1.err
echo "=== [$(date -u +%H:%M:%S)] full bench 1 done rc=$?" >> .r5/ab_campaign.log
