#!/bin/bash
# Focused headline probe: stable kv at 1e8 — grain x segseed, ordered by
# expected value (the stage-count model says small tiles + the XLA segment
# seed attack the compute-bound tilesort, which dominates the 3-plane kv
# cost). Each point is a fresh process (segseed/lookahead are trace-time).
cd /root/repo || exit 1
R=benchmarks/results
L=/tmp/tpu_logs
mkdir -p $L

run() { # run NAME ENV TILES CSV
  local name=$1 env=$2 tiles=$3 csv=$4
  echo "=== $name ==="
  timeout 2400 env $env python benchmarks/grain_sweep.py --engine merge --kv \
    --sizes 1e8 --tiles "$tiles" --csv "$csv" >>"$L/focus_$name.log" 2>&1
  tail -3 "$L/focus_$name.log"
}

run kv_seg1 VKRS_MERGE_SEGSEED=1 16,17 $R/v5e_merge_grain_kv_segseed.csv
run kv_seg0 VKRS_MERGE_SEGSEED=0 16,17 $R/v5e_merge_grain_kv.csv
run kv_seg1b VKRS_MERGE_SEGSEED=1 15,18 $R/v5e_merge_grain_kv_segseed.csv
run kv_seg0b VKRS_MERGE_SEGSEED=0 15 $R/v5e_merge_grain_kv.csv
echo "FOCUS DONE"
