#!/bin/bash
# Round-3c A/B: w3 factor packing vs w8 (default), and occ-update
# compaction sort (default) vs scatter.  Throughput-only, sequential,
# 60s gaps; JSON lines to .r3/ab_results3.jsonl.
cd /root/repo
OUT=.r3/ab_results3.jsonl
: > "$OUT"

run_cfg () {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] config: $name ($*)" >> .r3/ab_campaign3.log
  local t0=$SECONDS
  env "$@" \
      BENCH_QUALITY=0 BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=2700 \
      BENCH_LAST_GOOD_PATH=/root/repo/.r3/ab_last_good_scratch.json \
      timeout 2820 python bench.py > .r3/ab3_${name}.out 2> .r3/ab3_${name}.err
  local rc=$?
  local line
  line=$(grep -E '^\{' .r3/ab3_${name}.out | tail -1)
  if [ -z "$line" ]; then line='{"error": "no json line"}'; fi
  python - "$name" "$rc" "$((SECONDS-t0))" "$line" >> "$OUT" <<'EOF'
import json, sys
name, rc, dur, line = sys.argv[1:5]
try: rec = json.loads(line)
except Exception: rec = {"error": "unparseable: " + line[:200]}
rec.update(config=name, rc=int(rc), wall_s=int(dur))
print(json.dumps(rec))
EOF
  echo "=== [$(date -u +%H:%M:%S)] done $name rc=$rc" >> .r3/ab_campaign3.log
  sleep 60
}

run_cfg w3_carry     NERFACC_FACTOR_PACK=w3
run_cfg occ_scatter  NERFACC_OCC_COMPACT=scatter
echo "=== campaign 3 grid complete" >> .r3/ab_campaign3.log
