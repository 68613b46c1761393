#!/bin/bash
# Round-4 A/B #2: kernel window size at the campaign-1 winning pack config.
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
run_cfg "$@"
