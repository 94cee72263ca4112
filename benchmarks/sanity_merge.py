"""Merge-engine real-chip sanity gate: exact keys/kv/argsort at 1e6.

Run as step 0 of a measurement session (benchmarks/tpu_session_r3.sh):
compiles each merge pipeline once (wall-clock of first call = compile+run,
recorded for the BENCHMARKS compile-cost table) and verifies bitwise
exactness against the numpy stable oracle — the reference's testSort gate
(reference singleradixsort/src/SingleRadixSort.cpp:113-126) before any
timing is trusted.
"""

import os
import sys
import time

import numpy as np

# runnable as `python benchmarks/sanity_merge.py` from a source checkout
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=float, default=1e6)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU + Pallas interpret (dry-run the gate "
                         "itself off-TPU; avoids probing a down tunnel)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # after `import jax`: the axon sitecustomize overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import vkradixsort_tpu as vk

    n = int(args.n)
    cfg = vk.SortConfig(interpret=True) if args.cpu else vk.SortConfig()
    print(jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(3)
    k = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)

    t0 = time.time()
    out = np.asarray(vk.sort(jnp.asarray(k), backend="merge", config=cfg))
    print(f"merge n={n} keys compile+run s: {time.time() - t0:.1f}", flush=True)
    assert np.array_equal(out, np.sort(k)), "merge keys mismatch"

    # duplicate-heavy keys exercise the stability carry
    kd = k % 997
    perm = np.argsort(kd, kind="stable").astype(np.uint32)
    v = np.arange(k.size, dtype=np.uint32)
    t0 = time.time()
    ok, ov = vk.sort_pairs(jnp.asarray(kd), jnp.asarray(v), backend="merge",
                           config=cfg)
    ov = np.asarray(ov)
    print(f"merge n={n} kv compile+run s: {time.time() - t0:.1f}", flush=True)
    assert np.array_equal(ov, perm), "merge kv stability mismatch"

    t0 = time.time()
    pa = np.asarray(vk.argsort(jnp.asarray(kd), backend="merge", config=cfg))
    print(f"merge n={n} argsort compile+run s: {time.time() - t0:.1f}", flush=True)
    assert np.array_equal(pa, perm), "merge argsort mismatch"

    print(f"OK merge keys+kv+argsort exact at n={n} on",
          jax.default_backend(), flush=True)


if __name__ == "__main__":
    main()
