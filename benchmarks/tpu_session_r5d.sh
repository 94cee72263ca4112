#!/bin/bash
# Round-5 fourth window: controlled decision matrix for the two new
# trace-time knobs, all x64-off (the default-user context), all at the
# r5-step-3 grain/seed optimum (kv: grain 2^16, seed width 32768):
#   1. seed impl in-context: stable vs iota e2e (the r5b probe priced them
#      equal standalone, but the r5b no-lookahead profile's tilesort rose
#      147.9 -> 190.3 ms across the same config with the seed impl as the
#      only tracked change — untangle it with midstage pinned OFF)
#   2. midstage on/off e2e at the same config (the r5b stage bench priced
#      roll-based lane stages at 27-60x row stages; mid stages remove the
#      rolls for d in {128..1024})
#   3. keys 1e8 at the shipped config, midstage off/on
#   4. stage_bench net-row attribution with midstage ON (baseline OFF rows
#      are in r5b_3_stage_bench.log)
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r5d
mkdir -p "$M" "$R" "$L"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r5d_$name.log" 2>&1
  local rc=$?
  tail -8 "$L/r5d_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r5d_$name.log) ---"
  fi
  return $rc
}

for IMPL in stable iota; do
  step 1_kv_${IMPL}_mid0 2400 env VKRS_MERGE_SEGSEED=32768 \
    VKRS_MERGE_SEED_IMPL=$IMPL VKRS_MERGE_MIDSTAGE=0 \
    python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
    --tile 16 --csv $R/v5e_kv_impl_mid.csv
done

for IMPL in stable iota; do
  step 2_kv_${IMPL}_mid1 2400 env VKRS_MERGE_SEGSEED=32768 \
    VKRS_MERGE_SEED_IMPL=$IMPL VKRS_MERGE_MIDSTAGE=1 \
    python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
    --tile 16 --csv $R/v5e_kv_impl_mid.csv
done

step 3_keys_mid0 2400 env VKRS_MERGE_SEGSEED=8192 VKRS_MERGE_MIDSTAGE=0 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 \
  --tile 17 --csv $R/v5e_keys_mid.csv
step 3b_keys_mid1 2400 env VKRS_MERGE_SEGSEED=8192 VKRS_MERGE_MIDSTAGE=1 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 \
  --tile 17 --csv $R/v5e_keys_mid.csv

step 4_stage_mid1 3600 env VKRS_MERGE_MIDSTAGE=1 \
  python benchmarks/stage_bench.py --n 3e7 --tile-rows 64 --planes 1,2,3

echo "ALL DONE (markers in $M)"
