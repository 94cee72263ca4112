#!/bin/bash
# Round-5 measurement session: re-measure the machine that shipped (VERDICT
# r4 tasks 1/3/4/5/7). Round 4's final commit made syn_tie the default
# stable-kv pipeline, but every stable-kv calibration (grain, seed width,
# crossovers) and all published numbers were measured on the superseded
# 3-plane composite. This session syncs the evidence to the shipped code:
#   0. window-oracle validation of the syn_tie family at 1e8 (u64 keys,
#      multi-payload, u64 payload, zipf) — the ADVICE r4 medium item
#   1. real-TPU test run of the shipped merge/dispatch code (post-acd15ea)
#   2. syn_tie profiler: component attribution + HBM roofline (go/no-go
#      evidence for the 4-way-merge redesign)
#   3. syn_tie kv grain (2^16..2^18) x seed width (8192..32768) at 1e8
#   4. kv crossover re-bracket at 8e6/1e7/1.5e7/2e7 (syn_tie is ~18%
#      cheaper at 1e8, so the true flip sits below the encoded 1.5e7)
#   5. kv64 crossover re-bracket + 1e8 re-measure
#   6. zipf kv at 1e8 under syn_tie
#   7. u64-keys-under-Zipf tie probe: seed widths + grain (VERDICT weak #6)
#   8. mid-size grain sweeps at 2e7/4e7 for keys/kv/argsort (the newly
#      routed sizes inherited 1e8 optima unswept — VERDICT weak #2)
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r5
mkdir -p "$M" "$R" "$L"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r5_$name.log" 2>&1
  local rc=$?
  tail -8 "$L/r5_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r5_$name.log) ---"
  fi
  return $rc
}

# 0. the ADVICE r4 medium item: syn_tie configs whose only evidence was
#    interpret mode, validated bitwise on the real chip
step 0_validate_syn 7200 python benchmarks/validate_1e8.py \
  --csv $R/v5e_kv_syn_validate_r5.csv

# 1. real-TPU test evidence for the shipped (post-syn_tie) code
step 1_tpu_tests 5400 env VKRS_TEST_TPU=1 \
  python -m pytest tests/test_merge.py tests/test_dispatch.py -q

# 2. component attribution + roofline for the shipped stable-kv pipeline
step 2_profile_syn 3600 python benchmarks/profile_merge.py --n 1e8 \
  --planes 2,3 --syn-tie --segseed 16384 --tile-rows 64

# 2b. keys-only roofline at the shipped config (4-way go/no-go baseline)
step 2b_profile_keys 2400 python benchmarks/profile_merge.py --n 1e8 \
  --planes 1 --segseed 8192 --tile-rows 64

# 3. syn_tie kv grain x seed-width matrix at 1e8
for T in 16 17 18; do
  for W in 8192 16384 32768; do
    step 3_kv_g${T}_w${W} 2400 env VKRS_MERGE_SEGSEED=$W \
      python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
      --tile $T --csv $R/v5e_kv_syn_grainseed.csv
  done
done

# 4. kv crossover re-bracket (merge at the 1e8 optimum config vs tiled)
step 4_kv_crossover 4800 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge,tiled --op kv \
  --sizes 8e6,1e7,1.5e7,2e7 --tile 17 --csv $R/v5e_kv_syn_crossover.csv

# 5. kv64 crossover re-bracket + 1e8 under syn_tie
step 5_kv64_crossover 4800 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge,tiled --op kv --dtype uint64 \
  --sizes 4e6,6e6,1e7 --tile 17 --csv $R/v5e_kv64_syn_crossover.csv
step 5b_kv64_1e8 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --dtype uint64 \
  --sizes 1e8 --tile 17 --csv $R/v5e_kv64_syn_crossover.csv

# 6. zipf kv at 1e8 (heavy ties: the adversarial case for syn_tie)
step 6_kv_zipf 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge,tiled --op kv \
  --distribution zipf --sizes 1e8 --tile 17 --csv $R/v5e_kv_syn_zipf.csv

# 7. u64-keys-under-Zipf tie probe: wider/narrower seeds and grain
for W in 8192 32768; do
  step 7_u64zipf_w${W} 2400 env VKRS_MERGE_SEGSEED=$W \
    python benchmarks/sweep.py --engines merge --dtype uint64 \
    --distribution zipf --sizes 1e8 --tile 17 \
    --csv $R/v5e_u64_zipf_seedwidth.csv
done
step 7_u64zipf_g16 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --dtype uint64 \
  --distribution zipf --sizes 1e8 --tile 16 \
  --csv $R/v5e_u64_zipf_seedwidth.csv

# 8. mid-size grain sweeps at the newly-routed sizes
for T in 16 17 18; do
  step 8_keys_mid_g${T} 2400 env VKRS_MERGE_SEGSEED=8192 \
    python benchmarks/sweep.py --engines merge --sizes 2e7,4e7 \
    --tile $T --csv $R/v5e_keys_mid_grain.csv
  step 8_kv_mid_g${T} 3600 env VKRS_MERGE_SEGSEED=16384 \
    python benchmarks/sweep.py --engines merge --op kv --sizes 2e7,4e7 \
    --tile $T --csv $R/v5e_kv_mid_grain.csv
done
step 8_argsort_mid 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op argsort --sizes 4e7 \
  --tile 16 --csv $R/v5e_argsort_mid_grain.csv
step 8_argsort_mid17 3600 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op argsort --sizes 4e7 \
  --tile 17 --csv $R/v5e_argsort_mid_grain.csv

echo "ALL DONE (markers in $M)"
