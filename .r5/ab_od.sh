#!/bin/bash
cd /root/repo
# wait for the accum arm to finish (sequential TPU rule)
while ! grep -q "ab accum done" .r5/ab_campaign.log; do sleep 20; done
sleep 60
echo "=== [$(date -u +%H:%M:%S)] ab: fused 6-wide od gather (control: 13.05M / 38.01ms)" >> .r5/ab_campaign.log
BENCH_QUALITY=0 \
  BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=1500 BENCH_DEADLINE=1600 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/ab_od_last_good.json \
  timeout 1620 python bench.py > .r5/ab_od.out 2> .r5/ab_od.err
echo "=== [$(date -u +%H:%M:%S)] ab od done rc=$?" >> .r5/ab_campaign.log
