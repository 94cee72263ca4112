#!/bin/bash
# Round-3 third TPU window — crossover refinement + seed-width frontier.
#
#   1. kv + keys at 4e7 with the tuned config (segseed, grain 2^17): pins
#      the ROUTE_TABLE crossovers instead of log-midpoint guesses
#   2. wide-seed A/B at 1e8 (W = 2^13 / 2^14 vs the 2^11 default): the
#      stage-count model says replacing kernel levels 12..14 with one XLA
#      batched width-16384 sort (measured 3214 M/s) saves ~2x what the
#      wider XLA pass costs — decided here, not assumed
#   3. component attribution at the tuned grain G=64
#
# RESUMABLE: markers in /tmp/tpu_logs/markers_r3c.
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r3c
mkdir -p "$M" "$R"

step() {
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r3c_$name.log" 2>&1
  local rc=$?
  tail -6 "$L/r3c_$name.log"
  [ $rc -eq 0 ] && touch "$M/$name" || \
    echo "--- step $name FAILED rc=$rc (log: $L/r3c_$name.log) ---"
  return $rc
}

# 1: crossover pins at 4e7 (tuned merge vs tiled)
step 1_kv_4e7 3600 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge,tiled --sizes 4e7 --op kv \
  --tile 17 --csv $R/v5e_crossover_kv.csv
step 2_keys_4e7 3600 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge,tiled --sizes 4e7 \
  --tile 17 --csv $R/v5e_crossover_keys.csv

# 2: wide-seed A/B at 1e8, keys + kv, grain 2^17
step 3_keys_w13 2400 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/grain_sweep.py --engine merge --sizes 1e8 --tiles 17 \
  --csv $R/v5e_merge_seedw13_keys.csv
step 4_keys_w14 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/grain_sweep.py --engine merge --sizes 1e8 --tiles 17 \
  --csv $R/v5e_merge_seedw14_keys.csv
step 5_kv_w13 2400 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/grain_sweep.py --engine merge --kv --sizes 1e8 --tiles 17 \
  --csv $R/v5e_merge_seedw13_kv.csv
step 6_kv_w14 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/grain_sweep.py --engine merge --kv --sizes 1e8 --tiles 17 \
  --csv $R/v5e_merge_seedw14_kv.csv

# 3: attribution at the tuned grain
step 7_profile_g64 5400 env VKRS_MERGE_SEGSEED=1 \
  python -u benchmarks/profile_merge.py --n 1e8 --tile-rows 64 --planes 1,3

echo "R3C DONE (markers in $M)"
