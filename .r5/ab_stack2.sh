#!/bin/bash
cd /root/repo
sleep 60
echo "=== [$(date -u +%H:%M:%S)] ab: stack2 (+sysrow occ draw, unstable occ/compaction sorts; stack1 was 13.96M/35.39/occ34.9)" >> .r5/ab_campaign.log
BENCH_QUALITY=0 \
  BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=1500 BENCH_DEADLINE=1600 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/ab_stack2_last_good.json \
  timeout 1620 python bench.py > .r5/ab_stack2.out 2> .r5/ab_stack2.err
echo "=== [$(date -u +%H:%M:%S)] ab stack2 done rc=$?" >> .r5/ab_campaign.log
