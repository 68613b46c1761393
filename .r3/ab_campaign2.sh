#!/bin/bash
# Round-3b A/B: factor-path table gradient (fixed transposed-factor kernel)
# vs the round-3a winner (sort compaction, 8.02M).  Sequential, 60s settle
# gaps, one JSON line per config appended to .r3/ab_results2.jsonl.
cd /root/repo
OUT=.r3/ab_results2.jsonl
: > "$OUT"

run_cfg () {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] config: $name ($*)" >> .r3/ab_campaign2.log
  local t0=$SECONDS
  env "$@" \
      BENCH_QUALITY=0 BENCH_ATTEMPTS=1 BENCH_ATTEMPT_TIMEOUT=2700 \
      BENCH_LAST_GOOD_PATH=/root/repo/.r3/ab_last_good_scratch.json \
      timeout 2820 python bench.py > .r3/ab2_${name}.out 2> .r3/ab2_${name}.err
  local rc=$?
  local line
  line=$(grep -E '^\{' .r3/ab2_${name}.out | tail -1)
  if [ -z "$line" ]; then line='{"error": "no json line"}'; fi
  python - "$name" "$rc" "$((SECONDS-t0))" "$line" >> "$OUT" <<'EOF'
import json, sys
name, rc, dur, line = sys.argv[1:5]
try: rec = json.loads(line)
except Exception: rec = {"error": "unparseable: " + line[:200]}
rec.update(config=name, rc=int(rc), wall_s=int(dur))
print(json.dumps(rec))
EOF
  echo "=== [$(date -u +%H:%M:%S)] done $name rc=$rc" >> .r3/ab_campaign2.log
  sleep 60
}

run_cfg factor_take  BENCH_TGRAD=factor NERFACC_FACTOR_MOVE=take
run_cfg factor_carry BENCH_TGRAD=factor NERFACC_FACTOR_MOVE=carry
run_cfg sort_factor_take  NERFACC_COMPACT_IMPL=sort BENCH_TGRAD=factor NERFACC_FACTOR_MOVE=take
run_cfg sort_factor_carry NERFACC_COMPACT_IMPL=sort BENCH_TGRAD=factor NERFACC_FACTOR_MOVE=carry
echo "=== campaign 2 grid complete" >> .r3/ab_campaign2.log
