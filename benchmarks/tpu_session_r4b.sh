#!/bin/bash
# Round-4 follow-up: the seed-width curve kept improving through the first
# window's 2048/4096/8192/16384 points (449.7 -> 425.7 ms stable kv at
# 1e8), so walk it to the optimum, and re-check keys/argsort/u64 at the
# winning widths. Each width is a fresh process (the seed is trace-time).
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r4b
mkdir -p "$M" "$R"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r4b_$name.log" 2>&1
  local rc=$?
  tail -8 "$L/r4b_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r4b_$name.log) ---"
  fi
  return $rc
}

# 1: kv seed-width tail at 1e8, grain 2^17
step 1_kv_w32768 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 17 --csv $R/v5e_kv_seedwidth.csv
step 1b_kv_w65536 2400 env VKRS_MERGE_SEGSEED=65536 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 17 --csv $R/v5e_kv_seedwidth.csv
step 1c_kv_w131072 2400 env VKRS_MERGE_SEGSEED=131072 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 17 --csv $R/v5e_kv_seedwidth.csv

# 1d: a cheaper (seeded) tilesort shifts the grain optimum up — one fewer
# ladder level at 2^18; cross the width tail with the larger grain
step 1d_kv_w16384_t18 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 18 --csv $R/v5e_kv_seedwidth_t18.csv
step 1e_kv_w32768_t18 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 18 --csv $R/v5e_kv_seedwidth_t18.csv

# 2: keys seed-width at 1e8, grain 2^17 (142.26 ms at w=2048)
step 2_keys_w8192 2400 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 \
  --tile 17 --csv $R/v5e_keys_seedwidth.csv
step 2b_keys_w32768 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 \
  --tile 17 --csv $R/v5e_keys_seedwidth.csv

# 3: argsort at the kv-winning width (2 planes: between keys and kv)
step 3_argsort_w16384 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op argsort --sizes 1e8 \
  --tile 17 --csv $R/v5e_argsort_seedwidth.csv

# 4: u64 keys at the winning width (2 lex planes)
step 4_u64_w16384 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --dtype uint64 --sizes 1e8 \
  --tile 17 --csv $R/v5e_u64_seedwidth.csv

# 5: kv crossover re-check at the winning width (does a faster 1e8 point
# also pull the 2e7 point under tiled's 78.8 ms?)
step 5_kv_cross_w 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 2e7,4e7 \
  --tile 17 --csv $R/v5e_kv_crossover_w16384.csv

# 6: BASELINE config #4 — u64 keys under Zipf skew (heavy-bucket regime),
# routed default vs explicit merge
step 6_u64_zipf 3600 python benchmarks/sweep.py --engines merge,tiled \
  --dtype uint64 --distribution zipf --sizes 1e8 \
  --csv $R/v5e_u64_zipf.csv

# 7: u64-keys kv crossover — merge beat tiled 1.92x at 1e8 (633.5 vs
# 1216.9 ms, v5e_kv_u64keys.csv), so the flip point for wide-key kv sits
# far below the u32 kv crossover; locate it
step 7_kv64_cross 4800 python benchmarks/sweep.py --engines merge,tiled \
  --op kv --dtype uint64 --sizes 4e6,1e7,2e7 \
  --csv $R/v5e_kv_u64keys_crossover.csv

echo "ALL DONE (markers in $M)"
