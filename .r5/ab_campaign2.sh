#!/bin/bash
# Round-5 A/B #2: grouped tcnn-shape encoder as a THROUGHPUT config
# (16L x 2F x 2^19 — the reference's exact model shape), with and without
# the dout_lanes win from campaign 1.  If grouped lands at fused-class
# step time it is both the VERDICT-#4 done-criterion (within 5x of
# fused; target: ~1x) and a flagship candidate (2 gathers + 2 sorts per
# step vs 4 + 4).
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

run_cfg grouped_lanes NERFACC_DOUT_UNPACK=lanes BENCH_ENCODER=grouped BENCH_LEVELS=16 BENCH_FEATS=2 BENCH_LOG2T=19
run_cfg grouped_t3 NERFACC_DOUT_UNPACK=t3 BENCH_ENCODER=grouped BENCH_LEVELS=16 BENCH_FEATS=2 BENCH_LOG2T=19
echo "=== campaign 2 complete" >> .r5/ab_campaign.log
