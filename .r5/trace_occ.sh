#!/bin/bash
cd /root/repo
while ! grep -q "ab od done" .r5/ab_campaign.log; do sleep 20; done
sleep 60
echo "=== [$(date -u +%H:%M:%S)] trace capture (occ update, shipped config)" >> .r5/ab_campaign.log
timeout 1500 python scripts/capture_trace.py --occ-update --top 40 --out /tmp/jtrace_occ > .r5/trace_occ.out 2> .r5/trace_occ.err
echo "=== [$(date -u +%H:%M:%S)] trace occ done rc=$?" >> .r5/ab_campaign.log
