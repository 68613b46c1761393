#!/bin/bash
# Round-5 A/B #3: grouped tcnn-shape throughput after the sublane-pad fix.
cd /root/repo
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
  python - "$name" "$rc" "$((SECONDS-t0))" "$line" >> "$OUT" <<'PYEOF'
import json, sys
name, rc, dur, line = sys.argv[1:5]
try: rec = json.loads(line)
except Exception: rec = {"error": "unparseable: " + line[:200]}
rec.update(config=name, rc=int(rc), wall_s=int(dur))
print(json.dumps(rec))
PYEOF
  echo "=== [$(date -u +%H:%M:%S)] done $name rc=$rc" >> .r5/ab_campaign.log
  sleep 60
}
sleep 60
run_cfg grouped BENCH_ENCODER=grouped BENCH_LEVELS=16 BENCH_FEATS=2 BENCH_LOG2T=19
run_cfg grouped_occsoa BENCH_ENCODER=grouped BENCH_LEVELS=16 BENCH_FEATS=2 BENCH_LOG2T=19 NERFACC_OCC_SOA=1
run_cfg fused_occsoa NERFACC_OCC_SOA=1
echo "=== campaign 3 complete" >> .r5/ab_campaign.log
