"""Window-oracle validation of the routed stable-kv pipeline at 1e8.

bench.py gates the headline (u32 keys, one u32 payload, uniform) on bitwise
window checks against the native stable oracle; THIS tool extends that exact
gate to the other stable-kv family members the router ships — the
configurations whose only prior evidence was CPU interpret mode:

  * u64kv   — uint64 keys + one u32 payload (3 compare planes under syn_tie)
  * multi   — u32 keys + TWO u32 payloads (multi-payload syn_tie)
  * u64pay  — u32 keys + one u64 payload (split carry planes)
  * zipf    — u32 Zipf-skewed keys + one u32 payload (heavy-duplicate ties:
              the adversarial case for a synthesized tie-break)

For each: full host stable-argsort oracle (native C++ for u32 keys,
np.argsort(kind="stable") for u64 — reference SingleRadixSort.cpp:106-126
discipline at scale), K random 1024-wide windows of the device output
fetched and compared BITWISE for keys and every payload plane, then the
usual RTT-immune timing. One CSV row per config:

    config,n,dtype,payload,distribution,tpu_ms,mpairs_per_s,exact

Usage:
    python benchmarks/validate_1e8.py --csv benchmarks/results/v5e_kv_syn_validate.csv
    python benchmarks/validate_1e8.py --configs zipf --n 1e6 --cpu   # smoke
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CONFIGS = ("u64kv", "multi", "u64pay", "zipf")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=float, default=1e8)
    ap.add_argument("--configs", default=",".join(CONFIGS),
                    help=f"comma list from {CONFIGS}")
    ap.add_argument("--nwin", type=int, default=16)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0xBE7C)
    ap.add_argument("--csv", default="benchmarks/results/v5e_kv_syn_validate.csv")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs off-TPU)")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        # after `import jax`: the axon sitecustomize overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # u64 keys/payloads
    import jax.numpy as jnp

    import vkradixsort_tpu as vk
    from vkradixsort_tpu import native
    from vkradixsort_tpu.utils.fixtures import make_keys
    from vkradixsort_tpu.utils.timing import measure_pairs_seconds_per_call

    n = int(args.n)
    width = args.width
    rng = np.random.default_rng(args.seed)
    log(f"devices: {jax.devices()}  n={n:,} configs={args.configs}")

    def append_row(row):
        new = not os.path.exists(args.csv)
        with open(args.csv, "a", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(row.keys()))
            if new:
                w.writeheader()
            w.writerow(row)

    failures = 0
    for cfg in args.configs.split(","):
        if cfg == "u64kv":
            k_np = make_keys(rng, n, np.uint64, "uniform")
            vals = (jnp.arange(n, dtype=jnp.uint32),)
            exp_of_perm = [lambda p: p.astype(np.uint32)]
        elif cfg == "multi":
            k_np = make_keys(rng, n, np.uint32, "uniform")
            pos = jnp.arange(n, dtype=jnp.uint32)
            vals = (pos, ~pos)  # distinct planes catch payload swaps
            exp_of_perm = [lambda p: p.astype(np.uint32),
                           lambda p: ~p.astype(np.uint32)]
        elif cfg == "u64pay":
            k_np = make_keys(rng, n, np.uint32, "uniform")
            vals = (jnp.arange(n, dtype=jnp.uint64),)
            exp_of_perm = [lambda p: p.astype(np.uint64)]
        elif cfg == "zipf":
            k_np = make_keys(rng, n, np.uint32, "zipf")
            vals = (jnp.arange(n, dtype=jnp.uint32),)
            exp_of_perm = [lambda p: p.astype(np.uint32)]
        else:
            raise SystemExit(f"unknown config {cfg!r}; pick from {CONFIGS}")
        payload = {"u64kv": "u32", "multi": "u32x2", "u64pay": "u64",
                   "zipf": "u32"}[cfg]
        dist = "zipf" if cfg == "zipf" else "uniform"

        keys = jnp.asarray(k_np)
        multi = len(vals) > 1

        def f(k, v, _m=multi):
            # values tree shape must round-trip for the timing chain's carry
            ok, ov = vk.sort_pairs(k, tuple(v) if _m else v[0])
            return ok, (tuple(ov) if _m else (ov,))

        t0 = time.time()
        out_k, out_vs = jax.jit(f)(keys, vals)
        jax.block_until_ready(out_vs)
        log(f"[{cfg}] first call (compile+run): {time.time()-t0:.1f}s")

        # Full host stable oracle, then bitwise window compares.
        t0 = time.time()
        perm = native.oracle_argsort(k_np)  # np fallback for u64 keys
        log(f"[{cfg}] host stable-argsort oracle: {time.time()-t0:.1f}s")
        sorted_keys = k_np[perm]
        starts = np.sort(rng.integers(0, max(n - width, 1),
                                      size=args.nwin).astype(np.int64))
        starts[0] = 0
        starts[-1] = max(n - width, 0)
        exact = True
        detail = f"{args.nwin} windows of {width} bitwise-exact"
        for s in starts:
            s = int(s)
            got_k = np.asarray(out_k[s : s + width])
            if not np.array_equal(got_k, sorted_keys[s : s + width]):
                exact, detail = False, f"key window mismatch at [{s},{s+width})"
                break
            for vi, (ov, exp) in enumerate(zip(out_vs, exp_of_perm)):
                got_v = np.asarray(ov[s : s + width])
                if not np.array_equal(got_v, exp(perm[s : s + width])):
                    exact, detail = False, (
                        f"value[{vi}] window mismatch at [{s},{s+width})")
                    break
            if not exact:
                break
        log(f"[{cfg}] window oracle: {'OK — ' if exact else 'FAILED — '}{detail}")
        failures += 0 if exact else 1

        dt = measure_pairs_seconds_per_call(f, keys, vals, reps=2)
        log(f"[{cfg}] {dt*1e3:.2f} ms -> {n/dt/1e6:.1f} M pairs/s")
        append_row(dict(
            config=cfg, n=n, dtype=str(k_np.dtype), payload=payload,
            distribution=dist, tpu_ms=round(dt * 1e3, 2),
            mpairs_per_s=round(n / dt / 1e6, 1), exact=int(exact),
        ))

    if failures:
        raise SystemExit(f"{failures} config(s) FAILED window-oracle validation")
    log("all configs window-oracle exact")


if __name__ == "__main__":
    main()
