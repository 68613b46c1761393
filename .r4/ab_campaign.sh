#!/bin/bash
# Round-4 A/B #1: w3 factor packing (11 sort operands vs 17) + macro-K knee
# re-check at the 52ms step. Sequential, 60s settle gaps, one JSON line per
# config appended to .r4/ab_results.jsonl.
cd /root/repo
OUT=.r4/ab_results.jsonl

run_cfg () {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] config: $name ($*)" >> .r4/ab_campaign.log
  local t0=$SECONDS
  env "$@" \
      BENCH_QUALITY=0 BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=2400 \
      BENCH_DEADLINE=2500 \
      BENCH_LAST_GOOD_PATH=/root/repo/.r4/ab_last_good_scratch.json \
      timeout 2520 python bench.py > .r4/ab_${name}.out 2> .r4/ab_${name}.err
  local rc=$?
  local line
  line=$(grep -E '^\{' .r4/ab_${name}.out | tail -1)
  if [ -z "$line" ]; then line='{"error": "no json line"}'; fi
  python - "$name" "$rc" "$((SECONDS-t0))" "$line" >> "$OUT" <<'EOF'
import json, sys
name, rc, dur, line = sys.argv[1:5]
try: rec = json.loads(line)
except Exception: rec = {"error": "unparseable: " + line[:200]}
rec.update(config=name, rc=int(rc), wall_s=int(dur))
print(json.dumps(rec))
EOF
  echo "=== [$(date -u +%H:%M:%S)] done $name rc=$rc" >> .r4/ab_campaign.log
  sleep 60
}

run_cfg w3_pack NERFACC_FACTOR_PACK=w3
run_cfg k4 BENCH_MACROK=4
run_cfg w3_k4 NERFACC_FACTOR_PACK=w3 BENCH_MACROK=4
echo "=== campaign 1 complete" >> .r4/ab_campaign.log
