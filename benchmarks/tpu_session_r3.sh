#!/bin/bash
# Round-3 TPU measurement session — VERDICT tasks 1,3,4,5,6.
#
# RESUMABLE: each step writes a marker file on success and is skipped on
# rerun, so a tunnel drop mid-session costs only the interrupted step.
# Logs go to /tmp/tpu_logs/, CSVs append under benchmarks/results/.
# Rerun from scratch: rm -rf /tmp/tpu_logs/markers
cd /root/repo || exit 1
mkdir -p /tmp/tpu_logs benchmarks/results
R=benchmarks/results
L=/tmp/tpu_logs
M=$L/markers
mkdir -p "$M"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 to=$2
  shift 2
  if [ -f "$M/$name" ]; then
    echo "=== $name: already done (skip) ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@" >"$L/r3_$name.log" 2>&1
  local rc=$?
  tail -10 "$L/r3_$name.log"
  if [ $rc -eq 0 ]; then
    touch "$M/$name"
  else
    echo "--- step $name FAILED rc=$rc (log: $L/r3_$name.log) ---"
  fi
  return $rc
}

# 0: sanity gate — merge keys/kv/argsort bitwise-exact at 1e6 (compile times
#    logged). Abort the session if this fails: timings of a wrong sort are
#    worse than no timings.
step 0_sanity 2400 python -u benchmarks/sanity_merge.py || {
  echo "SANITY FAILED — aborting session"
  exit 1
}

# 2-4: merge vs tiled end-to-end, stable-kv (the headline metric) FIRST,
# then keys and argsort (VERDICT task 1). Ordered so a short tunnel window
# still lands the round's primary numbers; the test suites run later.
step 3_kv 5400 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e6,1e7,1e8 --op kv --csv $R/v5e_merge_vs_tiled_kv.csv
step 2_keys 5400 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e6,4e6,1.6e7,1e8 --csv $R/v5e_merge_vs_tiled_keys.csv
step 4_argsort 5400 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e6,1e7,1e8 --op argsort --csv $R/v5e_merge_vs_tiled_argsort.csv

# 5-6: merge grain sweeps per N (VERDICT task 3 — the NBPW-study analog)
# total-stage-count model (compute-bound kernel): levels x log2(T) + the
# T-network favors SMALL tiles, while per-level DMA read-amp (T+C)/T and
# per-tile fixed overheads favor large — sweep both slopes of the valley
step 5_grain 7200 python benchmarks/grain_sweep.py --engine merge \
  --sizes 1e6,1e7,1e8 --tiles 13,14,15,16,17,18,19,20 --csv $R/v5e_merge_grain.csv
step 6_grain_kv 5400 python benchmarks/grain_sweep.py --engine merge --kv \
  --sizes 1e7,1e8 --tiles 13,14,15,16,17,18 --csv $R/v5e_merge_grain_kv.csv

# 7: u64 keys (VERDICT task 6)
step 7_u64 5400 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e6,1e8 --dtype uint64 --csv $R/v5e_merge_vs_tiled_u64.csv

# 7b/7c: multi-plane payloads at the headline size (VERDICT task 6):
# one 8-byte payload (two carry planes) and u64 keys + u32 payload
step 7b_kv_u64payload 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv --payload u64 --csv $R/v5e_kv_payload_u64.csv
step 7c_kv_u64keys 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv --dtype uint64 --csv $R/v5e_kv_u64keys.csv

# 7d: the argsort-then-bulk-gather kv alternative (VERDICT task 4): merge
# argsort is one plane cheaper than carried kv, but pays a random-gather
# pass per output plane — measure the composite against the carried sort
step 7d_kv_gather 3600 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e8 --op kv_gather --csv $R/v5e_kv_gather.csv

# 8: DMA-lookahead A/B at the headline size (merge keys + kv)
step 8_ab_serial 3600 env VKRS_MERGE_LOOKAHEAD=0 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 \
  --csv $L/ab_serial_keys.csv
step 8b_ab_serial_kv 3600 env VKRS_MERGE_LOOKAHEAD=0 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 --op kv \
  --csv $L/ab_serial_kv.csv

# 8c/8d: XLA-segsort tilesort seed A/B at the headline size (keys + kv):
# replaces the network's levels 1..2048 with the chip's fastest measured
# regime (one batched width-2048 sort) — wins iff the tilesort is
# compute-bound enough to beat the extra XLA pass
step 8c_segseed 3600 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 \
  --csv $L/ab_segseed_keys.csv
step 8d_segseed_kv 3600 env VKRS_MERGE_SEGSEED=1 \
  python benchmarks/sweep.py --engines merge --sizes 1e8 --op kv \
  --csv $L/ab_segseed_kv.csv

# 9: component cost attribution (tilesort / split / level / e2e)
step 9_profile 5400 python -u benchmarks/profile_merge.py --n 1e8 --planes 1,2,3

# 1 (runs LAST despite the number): real-TPU test suites for the engines
# being measured (VERDICT task 5) — correctness at scale is already gated
# by step 0 + each sweep's exactness column, so the full suites yield the
# least marginal evidence per minute and must not burn a short tunnel
# window before the sweeps do.
step 1_tpu_tests 5400 env VKRS_TEST_TPU=1 \
  python -m pytest tests/test_merge.py tests/test_bitonic.py -q

echo "ALL DONE (markers in $M)"

# After the session (manual, in order):
#   1. python benchmarks/tables_from_csv.py benchmarks/results/v5e_merge_vs_tiled_*.csv \
#        --grain benchmarks/results/v5e_merge_grain*.csv
#      -> paste the printed rows into engine/config.py ROUTE_TABLE/GRAIN_TABLE
#         (incl. a dist_local row at the kv crossover), delete placeholders.
#   2. python benchmarks/plot.py benchmarks/results/v5e_merge*.csv --out timings
#   3. Update BENCHMARKS.md (merge column in the engine table, headline if it
#      moved, lookahead A/B, profile attribution), README headline,
#      PARITY.md row 3, ops/dispatch.py + ops/merge.py docstrings.
#   4. python bench.py  -> headline JSON (expect > 211 M pairs/s if the
#      merge kv rows won routing; else the measured negative result stands).
#   5. Commit CSVs + tables + docs together; rerun
#      tests/test_config.py (routing rows changed).
