#!/bin/bash
# Round-5 A/B #1: the two opt-ins left pending at end of round 4 —
# batched cross-level factor sort (one sort+kernel for all 4 levels) and
# lane-wise dout unpack (kills the copy.216 relayout).  Sequential, 60s
# settle gaps, one JSON line per config appended to .r5/ab_results.jsonl.
cd /root/repo
mkdir -p .r5
OUT=.r5/ab_results.jsonl

run_cfg () {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] config: $name ($*)" >> .r5/ab_campaign.log
  local t0=$SECONDS
  env "$@" \
      BENCH_QUALITY=0 BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=2400 \
      BENCH_DEADLINE=2500 \
      BENCH_LAST_GOOD_PATH=/root/repo/.r5/ab_last_good_scratch.json \
      timeout 2520 python bench.py > .r5/ab_${name}.out 2> .r5/ab_${name}.err
  local rc=$?
  local line
  line=$(grep -E '^\{' .r5/ab_${name}.out | tail -1)
  if [ -z "$line" ]; then line='{"error": "no json line"}'; fi
  python - "$name" "$rc" "$((SECONDS-t0))" "$line" >> "$OUT" <<'EOF'
import json, sys
name, rc, dur, line = sys.argv[1:5]
try: rec = json.loads(line)
except Exception: rec = {"error": "unparseable: " + line[:200]}
rec.update(config=name, rc=int(rc), wall_s=int(dur))
print(json.dumps(rec))
EOF
  echo "=== [$(date -u +%H:%M:%S)] done $name rc=$rc" >> .r5/ab_campaign.log
  sleep 60
}

run_cfg r5_defaults
run_cfg factor_batch NERFACC_FACTOR_BATCH=1
run_cfg dout_lanes NERFACC_DOUT_UNPACK=lanes
run_cfg batch_lanes NERFACC_FACTOR_BATCH=1 NERFACC_DOUT_UNPACK=lanes
echo "=== campaign 1 complete" >> .r5/ab_campaign.log
