#!/bin/bash
# Round-5 second window: decide the stable-seed implementation on hardware,
# then price the network's stages and the DMA-overlap exposure — the
# evidence base for the ladder-depth (4-way level) verdict.
#   1. seed_probe: stable vs iota vs packed XLA seed sorts at 1e8
#   2. e2e A/B at the NEW grain/seed optimum (g16 w32768, found by r5
#      step 3): each seed impl through the real pipeline
#   3. stage_bench: per-stage costs (row/lane/select/net), 1 and 2 planes
#   4. profiler with DMA lookahead OFF: how much window DMA the overlap
#      actually hides (the 4-way level's claimed saving)
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers_r5b
mkdir -p "$M" "$R" "$L"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r5b_$name.log" 2>&1
  local rc=$?
  tail -8 "$L/r5b_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r5b_$name.log) ---"
  fi
  return $rc
}

step 1_seed_probe 3600 python benchmarks/seed_probe.py --n 1e8 \
  --widths 16384,32768

for IMPL in stable iota packed; do
  step 2_kv_e2e_$IMPL 2400 env VKRS_MERGE_SEGSEED=32768 \
    VKRS_MERGE_SEED_IMPL=$IMPL JAX_ENABLE_X64=1 \
    python benchmarks/sweep.py --engines merge --op kv --sizes 1e8 \
    --tile 16 --csv $R/v5e_kv_seedimpl.csv
done

step 3_stage_bench 3600 python benchmarks/stage_bench.py --n 3e7 \
  --tile-rows 64 --planes 1,2,3

step 4_profile_nolookahead 2400 env VKRS_MERGE_LOOKAHEAD=0 \
  python benchmarks/profile_merge.py --n 1e8 --planes 2 --syn-tie \
  --segseed 16384 --tile-rows 64

echo "ALL DONE (markers in $M)"
