#!/bin/bash
cd /root/repo
sleep 60
echo "=== [$(date -u +%H:%M:%S)] ab: accum gather backward (control: 13.05M / 38.01ms / occ 34.8)" >> .r5/ab_campaign.log
NERFACC_ACCUM_BWD=gather BENCH_QUALITY=0 \
  BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=1500 BENCH_DEADLINE=1600 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/ab_accum_last_good.json \
  timeout 1620 python bench.py > .r5/ab_accum.out 2> .r5/ab_accum.err
echo "=== [$(date -u +%H:%M:%S)] ab accum done rc=$?" >> .r5/ab_campaign.log
