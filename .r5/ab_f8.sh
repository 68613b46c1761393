#!/bin/bash
cd /root/repo
sleep 90
echo "=== [$(date -u +%H:%M:%S)] ab: u10f8 throughput (control repro5: 13.05M / 38.01ms)" >> .r5/ab_campaign.log
NERFACC_FACTOR_PACK=u10f8 BENCH_QUALITY=0 \
  BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=1500 BENCH_DEADLINE=1600 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/ab_f8_last_good.json \
  timeout 1620 python bench.py > .r5/ab_f8.out 2> .r5/ab_f8.err
echo "=== [$(date -u +%H:%M:%S)] ab u10f8 done rc=$?" >> .r5/ab_campaign.log
