#!/bin/bash
cd /root/repo
while ! grep -q "ab stack2 done" .r5/ab_campaign.log; do sleep 20; done
sleep 60
echo "=== [$(date -u +%H:%M:%S)] hlo dump: train defaults" >> .r5/ab_campaign.log
timeout 900 python scripts/capture_trace.py --dump-hlo /root/repo/.r5/hlo_train_default.txt > .r5/hlo1.out 2>&1
echo "=== [$(date -u +%H:%M:%S)] hlo1 rc=$?" >> .r5/ab_campaign.log
sleep 60
echo "=== [$(date -u +%H:%M:%S)] hlo dump: train slice combine" >> .r5/ab_campaign.log
NERFACC_COMBINE=slice timeout 900 python scripts/capture_trace.py --dump-hlo /root/repo/.r5/hlo_train_slice.txt > .r5/hlo2.out 2>&1
echo "=== [$(date -u +%H:%M:%S)] hlo2 rc=$?" >> .r5/ab_campaign.log
sleep 60
echo "=== [$(date -u +%H:%M:%S)] ab: paired=auto (control stack2)" >> .r5/ab_campaign.log
BENCH_PAIRED=auto BENCH_QUALITY=0 \
  BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=1500 BENCH_DEADLINE=1600 \
  BENCH_LAST_GOOD_PATH=/root/repo/.r5/ab_paired_last_good.json \
  timeout 1620 python bench.py > .r5/ab_paired.out 2> .r5/ab_paired.err
echo "=== [$(date -u +%H:%M:%S)] ab paired done rc=$?" >> .r5/ab_campaign.log
