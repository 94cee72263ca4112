#!/bin/bash
# Round-5 re-measurement after the transpose-sandwich sub-128 stages
# (merge._sub128_stages) landed as default: every merge-engine number
# moved ~10-20% (kv 1e8 384.7 -> 321.4 ms, keys 139.1 -> 125.6, unstable
# kv 253.5 -> 219.8), so the headline family, crossovers and mid sizes are
# re-measured on the shipped code.
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r5h
mkdir -p "$M" "$R" "$L"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r5h_$name.log" 2>&1
  local rc=$?
  tail -6 "$L/r5h_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r5h_$name.log) ---"
  fi
  return $rc
}

# 1. window-oracle validation + timing of the syn_tie family on the new
#    network (u64-key kv, 2-payload, u64-payload, zipf kv)
step 1_validate 7200 python benchmarks/validate_1e8.py \
  --csv $R/v5e_kv_syn_validate_r5h.csv

# 2. the other headline points
step 2_u64keys 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --dtype uint64 --sizes 1e8 \
  --tile 17 --csv $R/v5e_u64_tpose.csv
step 2_argsort 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op argsort --sizes 1e8 \
  --tile 17 --csv $R/v5e_argsort_tpose.csv
step 2_f32 2400 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge --dtype float32 --sizes 1e8 \
  --tile 17 --csv $R/v5e_f32_tpose.csv

# 3. crossover re-brackets (merge cheaper -> flips move down; tiled
#    comparison points already recorded in the r5c CSVs)
step 3_kv_cross 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 6e6,8e6,1e7 \
  --tile 17 --csv $R/v5e_kv_tpose_crossover.csv
step 3_kv_cross_tiled 2400 \
  python benchmarks/sweep.py --engines tiled --op kv --sizes 6e6 \
  --csv $R/v5e_kv_tpose_crossover.csv
step 3_keys_cross 3600 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge,tiled --sizes 1e7,1.6e7 \
  --tile 17 --csv $R/v5e_keys_tpose_crossover.csv
step 3_argsort_cross 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op argsort --sizes 2e7,3e7 \
  --tile 17 --csv $R/v5e_argsort_tpose_crossover.csv
step 3_kv64_cross 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --dtype uint64 \
  --sizes 5e5,1e6 --tile 17 --csv $R/v5e_kv64_tpose_crossover.csv

# 4. grain sanity at the new stage costs (did the kv valley move?)
step 4_kv_g16 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 16 --csv $R/v5e_kv_tpose_grain.csv
step 4_kv_g17w32k 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 17 --csv $R/v5e_kv_tpose_grain.csv

# 5. mid sizes (engine-table rows)
step 5_kv_mid 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 2e7,4e7 \
  --tile 17 --csv $R/v5e_kv_tpose_mid.csv
step 5_keys_mid 3600 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge --sizes 2e7,4e7 \
  --tile 17 --csv $R/v5e_keys_tpose_mid.csv
step 5_unstable 2400 env JAX_ENABLE_X64=1 \
  python benchmarks/sweep.py --engines merge --op kv_unstable --sizes 2e7 \
  --tile 17 --csv $R/v5e_kv_unstable_tpose.csv

echo "ALL DONE (markers in $M)"
