#!/bin/bash
cd /root/repo
while ! grep -q "trace occ done" .r5/ab_campaign.log; do sleep 20; done
sleep 60
echo "=== [$(date -u +%H:%M:%S)] ab: r5 defaults stack (od+accum-gather+unstable sorts; od-only was 13.70M/36.08)" >> .r5/ab_campaign.log
BENCH_QUALITY=0 \
  BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=1500 BENCH_DEADLINE=1600 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/ab_stack_last_good.json \
  timeout 1620 python bench.py > .r5/ab_stack.out 2> .r5/ab_stack.err
echo "=== [$(date -u +%H:%M:%S)] ab stack done rc=$?" >> .r5/ab_campaign.log
