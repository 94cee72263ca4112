#!/bin/bash
# Round-4 TPU measurement session, ordered by headline value:
#   1. headline bench with the flipped kv routing (merge, seeded, 2^17)
#   2. kv crossover — seeded merge vs tiled at 2e7/4e7 (the 8e7 ROUTE row
#      is conservative; this refines it to the measured flip point)
#   3. kv seed-width A/B at 1e8 (wider XLA seed = fewer Pallas stages)
#   4. argsort decider at 1e8 (r3 tie: merge 338.4 vs tiled 340.6)
#   5. u64 keys at 1e8 with the swept grain + seed (r3 point was unswept)
#   6. parity matrix rows r3b never landed: u64 payload / u32x2 / u64-key
#      kv, kv_gather composite
#   7. real-TPU merge test suite (recorded in PARITY.md)
#   8. component attribution with the seed applied consistently
#
# RESUMABLE: marker files in /tmp/tpu_logs/markers_r4; rerun skips done
# steps. Logs in /tmp/tpu_logs/r4_*.log.
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r4
mkdir -p "$M" "$R"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r4_$name.log" 2>&1
  local rc=$?
  tail -8 "$L/r4_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r4_$name.log) ---"
  fi
  return $rc
}

# 1: the contract headline through the new default route (kv 1e8 -> merge,
# seeded, grain 2^17); window-oracle gated
step 1_bench 3600 python bench.py

# 2: kv crossover refinement — merge (table defaults would run these
# unseeded below 4e7, so force the seed: the candidate route IS seeded)
# vs tiled at 2e7/4e7; 1e7 rides along for a seeded small-size point
step 2_kv_cross 4800 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge,tiled --op kv \
  --sizes 1e7,2e7,4e7 --tile 17 --csv $R/v5e_kv_crossover_seeded.csv

# 3: kv seed-width A/B at 1e8, grain 2^17 (each width is a fresh process:
# the seed is trace-time)
step 3_kv_w4096 2400 env VKRS_MERGE_SEGSEED=4096 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 17 --csv $R/v5e_kv_seedwidth.csv
step 3b_kv_w8192 2400 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 17 --csv $R/v5e_kv_seedwidth.csv
step 3c_kv_w16384 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
  --tile 17 --csv $R/v5e_kv_seedwidth.csv

# 4: argsort decider — both engines, table defaults (merge: seeded 2^17)
step 4_argsort 3600 python benchmarks/sweep.py --engines merge,tiled \
  --op argsort --sizes 1e8 --csv $R/v5e_argsort_r4.csv

# 5: u64 keys at 1e8, swept grain + seed vs tiled
step 5_u64_seeded 3600 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge,tiled --dtype uint64 \
  --sizes 1e8 --tile 17 --csv $R/v5e_u64_seeded.csv

# 6: parity rows that never landed in r3b
step 6_kv_payload_u64 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv --payload u64 --csv $R/v5e_kv_payload_u64.csv
step 6b_kv_u32x2 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv --payload u32x2 --csv $R/v5e_kv_payload_u32x2.csv
step 6c_kv_u64keys 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv --dtype uint64 --csv $R/v5e_kv_u64keys.csv
step 6d_kv_gather 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv_gather --csv $R/v5e_kv_gather.csv

# 7: real-TPU test suite for the routed engines (recorded in PARITY.md)
step 7_tpu_tests 7200 env VKRS_TEST_TPU=1 \
  python -m pytest tests/test_merge.py tests/test_dispatch.py -q

# 8: component attribution, seed resolved identically for component+e2e rows
step 8_profile 5400 python -u benchmarks/profile_merge.py --n 1e8 \
  --planes 1,3 --segseed 1

echo "ALL DONE (markers in $M)"
