#!/bin/bash
# Round-3 second TPU measurement window — the points the first window left
# unmeasured, ordered by headline value:
#   1. segseed stable-kv exactness gate (duplicate-heavy zipf, exact oracle)
#      — the 449.7 ms kv point routes ONLY if this passes
#   2. keys 1e8 grain valley (plain + segseed): can the 148.5 ms keys
#      headline drop further?
#   3. u64 merge vs tiled at 1e6/1e8 (VERDICT task 6)
#   4. argsort through merge at the swept kv grain + segseed
#   5. multi-plane payloads, kv_gather composite (VERDICT tasks 4/6)
#   6. real-TPU merge/bitonic test suites (VERDICT task 5)
#   7. component attribution profile
#
# RESUMABLE: marker files in /tmp/tpu_logs/markers_r3b; rerun skips done
# steps. Logs in /tmp/tpu_logs/r3b_*.log.
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r3b
mkdir -p "$M" "$R"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r3b_$name.log" 2>&1
  local rc=$?
  tail -8 "$L/r3b_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r3b_$name.log) ---"
  fi
  return $rc
}

# 1: segseed stable-kv exactness vs the numpy stable oracle (zipf = heavy
# duplicates = the stability stress) at 1e7 (within sweep's verify_max)
step 1_seg_exact 2400 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge --sizes 1e7 --op kv \
  --distribution zipf --csv $L/r3b_seg_exact.csv

# 2: keys 1e8 grain valley, plain (grain rows 2^16/2^17 were never run at
# 1e8; 2^18 = 148.5 ms from the e2e sweep)
step 2_keys_grain 4800 python benchmarks/grain_sweep.py --engine merge \
  --sizes 1e8 --tiles 16,17 --csv $R/v5e_merge_grain.csv

# 3: keys 1e8 grain x segseed
step 3_keys_segseed 4800 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/grain_sweep.py --engine merge \
  --sizes 1e8 --tiles 16,17,18 --csv $R/v5e_merge_grain_segseed.csv

# 4: u64 keys, merge (2 lex planes) vs tiled (VERDICT task 6)
step 4_u64 4800 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e6,1e8 --dtype uint64 --csv $R/v5e_merge_vs_tiled_u64.csv

# 5: argsort through merge at the swept kv grain (2^17) + segseed —
# 2 planes vs kv's 3, so if kv-seg17 = 449.7 ms then this should land
# ~300-330 ms vs tiled's packed-i64 340.6 ms
step 5_argsort_seg17 3600 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 --op argsort \
  --tile 17 --csv $R/v5e_argsort_seg17.csv
step 5b_argsort_plain17 3600 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 --op argsort \
  --tile 17 --csv $R/v5e_argsort_t17.csv

# 6: kv with segseed at tile 2^17 but via the DISPATCH path (sweep --tile),
# confirming the routed composite reproduces the grain_sweep's 449.7 ms
step 6_kv_seg17_dispatch 3600 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 --op kv \
  --tile 17 --csv $R/v5e_kv_seg17_dispatch.csv

# 7: multi-plane payloads + u64 keys kv + gather composite (tasks 4/6)
step 7_kv_u64payload 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv --payload u64 --csv $R/v5e_kv_payload_u64.csv
step 7b_kv_u64keys 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv --dtype uint64 --csv $R/v5e_kv_u64keys.csv
step 7c_kv_gather 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv_gather --csv $R/v5e_kv_gather.csv

# 8: real-TPU test suites for the measured engines (VERDICT task 5)
step 8_tpu_tests 5400 env VKRS_TEST_TPU=1 \
  python -m pytest tests/test_merge.py tests/test_bitonic.py -q

# 9: component cost attribution (tilesort / split / level / e2e)
step 9_profile 5400 python -u benchmarks/profile_merge.py --n 1e8 --planes 1,2,3

echo "ALL DONE (markers in $M)"
