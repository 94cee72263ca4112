#!/bin/bash
# Round-4 third window: close the brackets the width sweep opened.
#   1. u32 kv at 1e7, seed width 16384 — the routed config's last
#      unmeasured crossover point (flip is at 1.5e7)
#   2. u64-key kv at 1e8, width 16384 vs the measured-2048 baseline —
#      validates the kv64 seed-width fallback the table now routes
#   3. keys at 2e7/4e7, width 8192 — does the cheaper tilesort move the
#      keys crossover below the round-3 4e7 point?
#   4. argsort at 4e7, width 16384 — refine the argsort flip (currently
#      at the measured 8e7..1e8 decade boundary)
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r4c
mkdir -p "$M" "$R"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r4c_$name.log" 2>&1
  local rc=$?
  tail -8 "$L/r4c_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r4c_$name.log) ---"
  fi
  return $rc
}

step 1_kv_1e7_w16384 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e7 \
  --tile 17 --csv $R/v5e_kv_crossover_w16384.csv

step 2_kv64_w16384 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --dtype uint64 \
  --sizes 1e8 --tile 17 --csv $R/v5e_kv64_seedwidth.csv
step 2b_kv64_w2048 2400 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge --op kv --dtype uint64 \
  --sizes 1e8 --tile 17 --csv $R/v5e_kv64_seedwidth.csv

step 3_keys_cross_w8192 3600 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge,tiled --sizes 2e7,4e7 \
  --tile 17 --csv $R/v5e_keys_crossover_w8192.csv

step 4_argsort_4e7_w16384 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge,tiled --op argsort --sizes 4e7 \
  --tile 17 --csv $R/v5e_argsort_crossover_w16384.csv

echo "ALL DONE (markers in $M)"
