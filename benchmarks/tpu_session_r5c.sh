#!/bin/bash
# Round-5 third window: finish re-calibrating the syn_tie stable-kv family
# at the NEW grain/seed optimum found by r5 step 3 (grain 2^16, seed width
# 32768: 354.8 ms at 1e8 vs 384.3 at the shipped 2^17/16384) and by the r5b
# seed-impl decision. Completes VERDICT r4 tasks 1/5/7:
#   1. kv crossover re-bracket at 8e6/1e7/1.5e7/2e7 — both the old (t17
#      w16384) and new (t16 w32768) merge configs vs tiled, so the flip and
#      the mid-size config are settled together
#   2. kv64 crossover re-bracket + 1e8 re-measure under syn_tie
#   3. zipf kv at 1e8: merge vs tiled (step 0 validated merge zipf exact at
#      380.9 ms; this prices the competitor)
#   4. u64-keys-under-Zipf tie probe (VERDICT weak #6): seed widths + grain
#   5. mid-size sweeps at 2e7/4e7 for keys/kv/argsort at the candidate
#      grain/seed configs (the newly-routed sizes inherited 1e8 optima)
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r5c
mkdir -p "$M" "$R" "$L"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r5c_$name.log" 2>&1
  local rc=$?
  tail -8 "$L/r5c_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r5c_$name.log) ---"
  fi
  return $rc
}

# 1. kv crossover re-bracket: tiled baseline + merge at both candidate configs
step 1_kv_cross_tiled 4800 \
  python benchmarks/sweep.py --engines tiled --op kv \
  --sizes 8e6,1e7,1.5e7,2e7 --csv $R/v5e_kv_syn_crossover.csv
step 1_kv_cross_new 4800 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op kv \
  --sizes 8e6,1e7,1.5e7,2e7 --tile 16 --csv $R/v5e_kv_syn_crossover.csv
step 1_kv_cross_old 4800 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv \
  --sizes 8e6,1e7,1.5e7,2e7 --tile 17 --csv $R/v5e_kv_syn_crossover.csv

# 2. kv64 crossover re-bracket + 1e8 under syn_tie
step 2_kv64_cross 4800 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge,tiled --op kv --dtype uint64 \
  --sizes 4e6,6e6,1e7 --tile 17 --csv $R/v5e_kv64_syn_crossover.csv
step 2b_kv64_1e8 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --dtype uint64 \
  --sizes 1e8 --tile 17 --csv $R/v5e_kv64_syn_crossover.csv
step 2c_kv64_1e8_new 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op kv --dtype uint64 \
  --sizes 1e8 --tile 16 --csv $R/v5e_kv64_syn_crossover.csv

# 3. zipf kv at 1e8: price the tiled competitor (merge zipf validated by r5
#    step 0 at 380.9 ms) and merge at the new optimum
step 3_kv_zipf_tiled 3600 \
  python benchmarks/sweep.py --engines tiled --op kv \
  --distribution zipf --sizes 1e8 --csv $R/v5e_kv_syn_zipf.csv
step 3b_kv_zipf_new 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op kv \
  --distribution zipf --sizes 1e8 --tile 16 --csv $R/v5e_kv_syn_zipf.csv

# 4. u64-keys-under-Zipf tie probe: wider/narrower seeds and grain
for W in 8192 32768; do
  step 4_u64zipf_w${W} 2400 env VKRS_MERGE_SEGSEED=$W \
    python benchmarks/sweep.py --engines merge --dtype uint64 \
    --distribution zipf --sizes 1e8 --tile 17 \
    --csv $R/v5e_u64_zipf_seedwidth.csv
done
step 4_u64zipf_g16 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --dtype uint64 \
  --distribution zipf --sizes 1e8 --tile 16 \
  --csv $R/v5e_u64_zipf_seedwidth.csv

# 5. mid-size sweeps at the newly-routed sizes (keys: w8192 across grains;
#    kv: both candidate (grain, width) configs)
for T in 16 17; do
  step 5_keys_mid_g${T} 2400 env VKRS_MERGE_SEGSEED=8192 \
    python benchmarks/sweep.py --engines merge --sizes 2e7,4e7 \
    --tile $T --csv $R/v5e_keys_mid_grain.csv
done
step 5_kv_mid_new 3600 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 2e7,4e7 \
  --tile 16 --csv $R/v5e_kv_mid_grain.csv
step 5_kv_mid_old 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 2e7,4e7 \
  --tile 17 --csv $R/v5e_kv_mid_grain.csv
step 5_argsort_mid_new 3600 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op argsort --sizes 4e7 \
  --tile 16 --csv $R/v5e_argsort_mid_grain.csv
step 5_argsort_mid_old 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op argsort --sizes 4e7 \
  --tile 17 --csv $R/v5e_argsort_mid_grain.csv

# 6. keys + argsort at 1e8 at the new-candidate grain (keys currently ship
#    g17 w8192 = 139.1 ms; does the kv optimum shift apply to 1-plane too?)
step 6_keys_1e8_g16 2400 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 \
  --tile 16 --csv $R/v5e_keys_g16.csv
step 6b_keys_1e8_g16w32k 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 \
  --tile 16 --csv $R/v5e_keys_g16.csv
step 6c_argsort_1e8_new 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op argsort --sizes 1e8 \
  --tile 16 --csv $R/v5e_argsort_g16.csv

echo "ALL DONE (markers in $M)"
