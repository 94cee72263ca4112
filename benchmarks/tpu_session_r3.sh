#!/bin/bash
# Round-3 TPU measurement session — VERDICT tasks 1,3,4,5,6.
# Logs to /tmp/tpu_logs/, CSVs append under benchmarks/results/.
cd /root/repo || exit 1
mkdir -p /tmp/tpu_logs benchmarks/results
R=benchmarks/results
L=/tmp/tpu_logs

echo "=== step 0: sanity + merge correctness at 1e6 (real chip, compile timing) ==="
timeout 2400 python - > $L/r3_0_sanity.log 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp, time
import vkradixsort_tpu as vk
print(jax.default_backend(), jax.devices(), flush=True)
rng = np.random.default_rng(3)
k = rng.integers(0, 1 << 32, size=1_000_000, dtype=np.uint32)
t0 = time.time()
out = np.asarray(vk.sort(jnp.asarray(k), backend="merge"))
print("merge 1e6 keys compile+run s:", round(time.time() - t0, 1), flush=True)
assert np.array_equal(out, np.sort(k)), "merge 1e6 keys mismatch"
v = np.arange(k.size, dtype=np.uint32)
t0 = time.time()
ok, ov = vk.sort_pairs(jnp.asarray(k % 997), jnp.asarray(v), backend="merge")
ov = np.asarray(ov)
print("merge 1e6 kv compile+run s:", round(time.time() - t0, 1), flush=True)
perm = np.argsort(k % 997, kind="stable")
assert np.array_equal(ov, perm.astype(np.uint32)), "merge kv stability"
t0 = time.time()
pa = np.asarray(vk.argsort(jnp.asarray(k % 997), backend="merge"))
print("merge 1e6 argsort compile+run s:", round(time.time() - t0, 1), flush=True)
assert np.array_equal(pa, perm.astype(np.uint32)), "merge argsort"
print("OK merge keys+kv+argsort exact at 1e6 on TPU", flush=True)
EOF
grep -q "OK merge" $L/r3_0_sanity.log || { echo "SANITY FAILED"; tail -30 $L/r3_0_sanity.log; exit 1; }
echo "sanity ok"

echo "=== step 1: real-TPU merge + bitonic test suites (VERDICT task 5) ==="
VKRS_TEST_TPU=1 timeout 5400 python -m pytest tests/test_merge.py tests/test_bitonic.py -q \
  > $L/r3_1_tpu_tests.log 2>&1
tail -3 $L/r3_1_tpu_tests.log

echo "=== step 2: merge vs tiled, keys, 1e6..1e8 ==="
timeout 5400 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e6,4e6,1.6e7,1e8 --csv $R/v5e_merge_vs_tiled_keys.csv \
  > $L/r3_2_keys.log 2>&1
tail -10 $L/r3_2_keys.log

echo "=== step 3: merge vs tiled, stable kv, 1e6..1e8 ==="
timeout 5400 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e6,1e7,1e8 --op kv --csv $R/v5e_merge_vs_tiled_kv.csv \
  > $L/r3_3_kv.log 2>&1
tail -8 $L/r3_3_kv.log

echo "=== step 4: merge vs tiled, argsort, 1e6..1e8 ==="
timeout 5400 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e6,1e7,1e8 --op argsort --csv $R/v5e_merge_vs_tiled_argsort.csv \
  > $L/r3_4_argsort.log 2>&1
tail -8 $L/r3_4_argsort.log

echo "=== step 5: merge grain sweep, keys (VERDICT task 3) ==="
timeout 7200 python benchmarks/grain_sweep.py --engine merge \
  --sizes 1e6,1e7,1e8 --tiles 16,17,18,19,20 --csv $R/v5e_merge_grain.csv \
  > $L/r3_5_grain.log 2>&1
tail -18 $L/r3_5_grain.log

echo "=== step 6: merge grain sweep, kv ==="
timeout 5400 python benchmarks/grain_sweep.py --engine merge --kv \
  --sizes 1e7,1e8 --tiles 15,16,17,18 --csv $R/v5e_merge_grain_kv.csv \
  > $L/r3_6_grain_kv.log 2>&1
tail -10 $L/r3_6_grain_kv.log

echo "=== step 7: u64 keys, merge vs tiled (VERDICT task 6) ==="
timeout 5400 python benchmarks/sweep.py --engines merge,tiled \
  --sizes 1e6,1e8 --dtype uint64 --csv $R/v5e_merge_vs_tiled_u64.csv \
  > $L/r3_7_u64.log 2>&1
tail -6 $L/r3_7_u64.log

echo "=== step 8: lookahead A/B (merge keys + kv at 1e8) ==="
VKRS_MERGE_LOOKAHEAD=0 timeout 3600 python benchmarks/sweep.py --engines merge \
  --sizes 1e8 --csv /tmp/tpu_logs/ab_serial_keys.csv \
  > $L/r3_8_ab_serial.log 2>&1
tail -3 $L/r3_8_ab_serial.log
VKRS_MERGE_LOOKAHEAD=0 timeout 3600 python benchmarks/sweep.py --engines merge \
  --sizes 1e8 --op kv --csv /tmp/tpu_logs/ab_serial_kv.csv \
  > $L/r3_8_ab_serial_kv.log 2>&1
tail -3 $L/r3_8_ab_serial_kv.log

echo "ALL DONE"
