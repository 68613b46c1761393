#!/bin/bash
# Round-3 A/B grid on the real chip: throughput-only bench runs, sequential,
# 60s settle gaps, one JSON line per config appended to .r3/ab_results.jsonl.
cd /root/repo
OUT=.r3/ab_results.jsonl
: > "$OUT"

run_cfg () {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] config: $name ($*)" >> .r3/ab_campaign.log
  local t0=$SECONDS
  env "$@" \
      BENCH_QUALITY=0 BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=2700 \
      BENCH_LAST_GOOD_PATH=/root/repo/.r3/ab_last_good_scratch.json \
      timeout 2820 python bench.py > .r3/ab_${name}.out 2> .r3/ab_${name}.err
  local rc=$?
  local line
  line=$(grep -E '^\{' .r3/ab_${name}.out | tail -1)
  if [ -z "$line" ]; then line='{"error": "no json line"}'; fi
  python - "$name" "$rc" "$((SECONDS-t0))" "$line" >> "$OUT" <<'EOF'
import json, sys
name, rc, dur, line = sys.argv[1:5]
try: rec = json.loads(line)
except Exception: rec = {"error": "unparseable: " + line[:200]}
rec.update(config=name, rc=int(rc), wall_s=int(dur))
print(json.dumps(rec))
EOF
  echo "=== [$(date -u +%H:%M:%S)] done $name rc=$rc" >> .r3/ab_campaign.log
  sleep 60
}

run_cfg base
run_cfg sort        NERFACC_COMPACT_IMPL=sort
run_cfg factor_take BENCH_TGRAD=factor NERFACC_FACTOR_MOVE=take
run_cfg factor_carry BENCH_TGRAD=factor NERFACC_FACTOR_MOVE=carry
echo "=== campaign primary grid complete" >> .r3/ab_campaign.log
