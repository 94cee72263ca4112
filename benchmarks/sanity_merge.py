"""Merge-engine real-chip sanity gate: exact keys/kv/argsort at 1e6.

Run as step 0 of a measurement session (benchmarks/tpu_session_r3.sh):
compiles each merge pipeline once (wall-clock of first call = compile+run,
recorded for the BENCHMARKS compile-cost table) and verifies bitwise
exactness against the numpy stable oracle — the reference's testSort gate
(reference singleradixsort/src/SingleRadixSort.cpp:113-126) before any
timing is trusted.
"""

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import vkradixsort_tpu as vk

    print(jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(3)
    k = rng.integers(0, 1 << 32, size=1_000_000, dtype=np.uint32)

    t0 = time.time()
    out = np.asarray(vk.sort(jnp.asarray(k), backend="merge"))
    print(f"merge 1e6 keys compile+run s: {time.time() - t0:.1f}", flush=True)
    assert np.array_equal(out, np.sort(k)), "merge 1e6 keys mismatch"

    # duplicate-heavy keys exercise the stability carry
    kd = k % 997
    perm = np.argsort(kd, kind="stable").astype(np.uint32)
    v = np.arange(k.size, dtype=np.uint32)
    t0 = time.time()
    ok, ov = vk.sort_pairs(jnp.asarray(kd), jnp.asarray(v), backend="merge")
    ov = np.asarray(ov)
    print(f"merge 1e6 kv compile+run s: {time.time() - t0:.1f}", flush=True)
    assert np.array_equal(ov, perm), "merge kv stability mismatch"

    t0 = time.time()
    pa = np.asarray(vk.argsort(jnp.asarray(kd), backend="merge"))
    print(f"merge 1e6 argsort compile+run s: {time.time() - t0:.1f}", flush=True)
    assert np.array_equal(pa, perm), "merge argsort mismatch"

    print("OK merge keys+kv+argsort exact at 1e6 on", jax.default_backend(),
          flush=True)


if __name__ == "__main__":
    main()
