#!/bin/bash
# Round-4 fourth window: close the last loose ends the tables left open.
#   1. kv + 8-byte payload at the width optimum (the 557.3 ms row ran at
#      seed 2048; every other op gained 5-8% from the wider seed)
#   2. f32 keys at 1e8 through the DEFAULT route (now merge): the encode
#      fusion claim was measured on tiled — re-verify at the new route
#   3. keys at the 1.6e7 flip boundary, seeded w8192 (tiled won 17.5 ms
#      there unseeded in r3; the flip point assumes it still wins)
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r4d
mkdir -p "$M" "$R"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r4d_$name.log" 2>&1
  local rc=$?
  tail -8 "$L/r4d_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r4d_$name.log) ---"
  fi
  return $rc
}

step 1_kvu64pay_w16384 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --payload u64 \
  --sizes 1e8 --tile 17 --csv $R/v5e_kv_payload_u64_w16384.csv
step 1b_kvx2_w16384 2400 env VKRS_MERGE_SEGSEED=16384 \
  python benchmarks/sweep.py --engines merge --op kv --payload u32x2 \
  --sizes 1e8 --tile 17 --csv $R/v5e_kv_payload_u32x2_w16384.csv

step 2_f32_routed 2400 python benchmarks/sweep.py --engines tiled,merge \
  --dtype float32 --sizes 1e8 --csv $R/v5e_f32_r4.csv

step 3_keys_16e6 2400 env VKRS_MERGE_SEGSEED=8192 \
  python benchmarks/sweep.py --engines merge,tiled --sizes 1.6e7 \
  --tile 17 --csv $R/v5e_keys_boundary_16e6.csv

echo "ALL DONE (markers in $M)"
