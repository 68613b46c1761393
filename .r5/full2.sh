#!/bin/bash
cd /root/repo
sleep 60
echo "=== [$(date -u +%H:%M:%S)] full bench 2 (split-key grouped, clean box)" >> .r5/ab_campaign.log
BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=4500 BENCH_DEADLINE=4600 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/full2_last_good.json \
  timeout 4620 python bench.py > .r5/full2.out 2> .r5/full2.err
echo "=== [$(date -u +%H:%M:%S)] full bench 2 done rc=$?" >> .r5/ab_campaign.log
