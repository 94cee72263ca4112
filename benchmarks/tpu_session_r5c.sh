#!/bin/bash
# Round-5 final measurement session, run AFTER the r5b/r5d decisions
# settled the defaults (seed impl auto->iota, midstage off, grain 2^17 +
# seed width 16384 for kv — the grain x seed surface measured FLAT at
# 384-388 ms once the truncated-seed artifact rows were purged, so the
# r4-shipped config stands). Completes VERDICT r4 tasks 1/5/7:
#   1. kv crossover re-bracket under syn_tie (r4's 1.5e7 flip was measured
#      on the 3-plane composite; syn_tie is ~19% cheaper at 1e8)
#   2. kv64 crossover + 1e8 under syn_tie
#   3. zipf kv 1e8: the tiled competitor (merge zipf = 380.86 ms,
#      window-oracle exact, r5 step 0)
#   4. u64-keys-under-Zipf tie probe (VERDICT weak #6)
#   5. kv mid sizes under syn_tie + keys mid sizes at g16 (per-size grain
#      rows instead of inherited 1e8 optima — VERDICT weak #2)
#   6. grain x seed matrix holes (the two cells whose first run was the
#      corrupted-seed artifact)
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

# 1. kv crossover re-bracket (shipped merge config vs tiled)
step 1_kv_cross_tiled 4800 \
  python benchmarks/sweep.py --engines tiled --op kv \
  --sizes 8e6,1e7,1.5e7,2e7 --csv $R/v5e_kv_syn_crossover.csv
step 1_kv_cross_merge 4800 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv \
  --sizes 8e6,1e7,1.5e7,2e7 --tile 17 --csv $R/v5e_kv_syn_crossover.csv

# 2. kv64 crossover + 1e8 under syn_tie
step 2_kv64_cross 4800 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge,tiled --op kv --dtype uint64 \
  --sizes 4e6,6e6,1e7 --tile 17 --csv $R/v5e_kv64_syn_crossover.csv
step 2b_kv64_1e8 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --dtype uint64 \
  --sizes 1e8 --tile 17 --csv $R/v5e_kv64_syn_crossover.csv

# 3. zipf kv 1e8: price the tiled competitor
step 3_kv_zipf_tiled 3600 \
  python benchmarks/sweep.py --engines tiled --op kv \
  --distribution zipf --sizes 1e8 --csv $R/v5e_kv_syn_zipf.csv

# 4. u64-keys-under-Zipf tie probe: seed widths + grain
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

# 5. mid sizes: kv under syn_tie at the shipped config (r4's 74.3/160.0 ms
#    rows predate syn_tie); keys at g16 (g17 measured 24.3/53.1 in r4)
step 5_kv_mid 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 2e7,4e7 \
  --tile 17 --csv $R/v5e_kv_mid_grain.csv
step 5_keys_mid_g16 2400 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge --sizes 2e7,4e7 \
  --tile 16 --csv $R/v5e_keys_mid_grain.csv

# 6. grain x seed matrix holes (valid re-runs of the purged cells)
step 6_kv_g16_w32768 2400 env VKRS_MERGE_SEGSEED=32768 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 16 --csv $R/v5e_kv_syn_grainseed.csv
step 6_kv_g17_w8192 2400 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 17 --csv $R/v5e_kv_syn_grainseed.csv

echo "ALL DONE (markers in $M)"
