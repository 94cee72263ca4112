"""Benchmark sweep CLI — the reference's experiment matrix, reproduced.

The reference produced its README timing plots from commented-out CSV
appenders writing ``N NBPW gpuTime cpuTime`` per run
(singleradixsort/src/SingleRadixSort.cpp:44-46,
multiradixsort/src/MultiRadixSort.cpp:78-80, loops in the example mains).
This CLI is that harness as a first-class tool: sweep engines x sizes x
distributions on the attached TPU, verify each point exactly against the
host oracle where the host can hold it, and append CSV rows

    engine,n,dtype,kv,distribution,tpu_ms,cpu_ms,mkeys_per_s,exact

Usage:
    python benchmarks/sweep.py                          # default matrix
    python benchmarks/sweep.py --engines tiled,bitonic --sizes 1e3,1e5,1e6
    python benchmarks/sweep.py --kv --csv out.csv
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

# runnable as `python benchmarks/sweep.py` from a source checkout
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_sizes(s: str) -> list[int]:
    return [int(float(x)) for x in s.split(",")]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engines", default="tiled",
                    help="comma list: tiled,merge,bitonic,samplesort,"
                         "radix_tiled,reference,fused")
    ap.add_argument("--sizes", default="1e2,1e3,1e4,1e5,1e6,1e7,1e8",
                    help="comma list of N (floats ok)")
    ap.add_argument("--distribution", default="uniform",
                    choices=["uniform", "uniform28", "descending", "constant", "zipf"])
    ap.add_argument("--kv", action="store_true", help="sort key-value pairs")
    ap.add_argument("--op", default=None,
                    choices=["keys", "kv", "kv_unstable", "kv_gather", "argsort"],
                    help="operation to sweep (overrides --kv; argsort/kv_unstable "
                         "enable x64 and exercise the packed fast paths on 'tiled'; "
                         "kv_gather is the composite argsort-then-bulk-gather "
                         "alternative to the carried kv sort — VERDICT r2 task 4)")
    ap.add_argument("--dtype", default="uint32",
                    choices=["uint32", "uint64", "float32", "int32"])
    ap.add_argument("--payload", default="u32",
                    choices=["u32", "u64", "u32x2"],
                    help="payload plane(s) for the kv ops: one 4-byte array "
                         "(default), one 8-byte array (two carry planes on the "
                         "Pallas engines), or TWO 4-byte arrays (multi-payload)")
    ap.add_argument("--tile", type=int, default=None,
                    help="log2 elements-per-tile grain override "
                         "(SortConfig.tile = 1 << TILE) for all engines")
    ap.add_argument("--csv", default="sweep.csv", help="CSV output path (appends)")
    ap.add_argument("--verify-max", type=int, default=20_000_000,
                    help="exact host verification up to this N (device-side sortedness above)")
    ap.add_argument("--seed", type=int, default=0xBE7C)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs off-TPU)")
    ap.add_argument("--interpret", action="store_true",
                    help="run Pallas engines in interpreter mode (with --cpu: "
                         "dry-run the whole matrix off-TPU before a chip session)")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        # after `import jax`: the axon sitecustomize overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    op = args.op or ("kv" if args.kv else "keys")
    args.kv = op == "kv"
    kv_ops = ("kv", "kv_unstable", "kv_gather")
    if np.dtype(args.dtype).kind in "fi" and op != "keys":
        ap.error("float/signed key dtypes currently sweep --op keys only "
                 "(the kv/argsort timing chains carry unsigned bits)")
    if args.payload != "u32" and op not in kv_ops:
        ap.error("--payload applies to the kv ops only")
    if (args.dtype == "uint64" or args.payload == "u64"
            or op in ("argsort", "kv_unstable", "kv_gather")):
        jax.config.update("jax_enable_x64", True)

    import vkradixsort_tpu as vk

    from vkradixsort_tpu.engine.config import DEFAULT_CONFIG

    config = DEFAULT_CONFIG.replace(interpret=True) if args.interpret \
        else DEFAULT_CONFIG
    if args.tile is not None:
        config = config.replace(tile=1 << args.tile)
    from vkradixsort_tpu.utils.timing import (
        measure_pairs_seconds_per_call,
        measure_seconds_per_call,
    )

    from vkradixsort_tpu.utils.fixtures import make_keys

    rng = np.random.default_rng(args.seed)
    dtype = np.dtype(args.dtype)
    engines = args.engines.split(",")
    sizes = parse_sizes(args.sizes)
    log(f"devices: {jax.devices()}  engines={engines} sizes={sizes} "
        f"dist={args.distribution} op={op}")

    def _multiset_ok(jnp, np, a_in, a_out):
        """Device-side multiset equality of two same-dtype arrays via a
        4096-bin histogram of mixed bit views (bench.py's gate).

        8-byte dtypes mix in u64 directly: a narrowing ``.view(u32)`` is a
        bitcast to shape (n, 2) in JAX, and the TPU layout pads the minor
        dim 2 to 128 — a 64x HBM blowup that OOMs at 1e8."""
        def hist(x):
            if x.dtype.itemsize == 8:
                y = x.view(jnp.uint64) if x.dtype != jnp.uint64 else x
                y = y ^ (y >> np.uint64(33))
                y = y * np.uint64(0xFF51AFD7ED558CCD)
                y = y ^ (y >> np.uint64(29))
                return jnp.bincount(
                    (y >> np.uint64(52)).astype(jnp.uint32), length=4096
                )
            b = x.view(jnp.uint32) if x.dtype != jnp.uint32 else x
            b = b ^ (b >> np.uint32(16))
            b = b * np.uint32(0x7FEB352D)
            b = b ^ (b >> np.uint32(15))
            return jnp.bincount(b >> np.uint32(20), length=4096)

        return bool(jnp.all(hist(a_in) == hist(a_out)))

    def append_row(row):
        # flushed per point, not at exit: a step timeout mid-sweep keeps
        # every already-measured row (compiles dominate the cost of redoing)
        new = not os.path.exists(args.csv)
        with open(args.csv, "a", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(row.keys()))
            if new:
                w.writeheader()
            w.writerow(row)

    nrows = 0
    for n in sizes:
        k_np = make_keys(rng, n, dtype, args.distribution)
        keys = jnp.asarray(k_np)
        t0 = time.perf_counter()
        oracle = np.sort(k_np, kind="stable") if n <= args.verify_max else None
        cpu_ms = (time.perf_counter() - t0) * 1e3 if oracle is not None else float("nan")

        for engine in engines:
            if engine == "bitonic" and n > (1 << 22):
                continue  # VMEM bound
            if engine == "fused" and n > (1 << 14):
                continue  # compile-time bound
            if engine == "samplesort" and (op != "keys" or n < (1 << 16)):
                continue  # keys-only here, large-N engine
            try:
                if op in kv_ops:
                    if args.payload == "u64":
                        values = jnp.arange(n, dtype=jnp.uint64)
                    elif args.payload == "u32x2":
                        pos = jnp.arange(n, dtype=jnp.uint32)
                        values = (pos, ~pos)  # distinct planes catch swaps
                    else:
                        values = jnp.arange(n, dtype=jnp.uint32)

                    if op == "kv_gather":
                        # the argsort-then-bulk-gather composite: one fewer
                        # carried plane on merge, but one random gather pass
                        # per payload plane (plus the keys) afterwards
                        def f(kk, vv, _e=engine):
                            perm = vk.argsort(kk, backend=_e, config=config)
                            return jnp.take(kk, perm), jax.tree.map(
                                lambda a: jnp.take(a, perm), vv
                            )
                    else:
                        def f(kk, vv, _e=engine, _s=(op == "kv")):
                            return vk.sort_pairs(kk, vv, backend=_e, stable=_s,
                                                 config=config)

                    out_k, out_v = jax.jit(f)(keys, values)
                    dt = measure_pairs_seconds_per_call(f, keys, values, reps=4)
                elif op == "argsort":
                    def f(kk, _e=engine):
                        return vk.argsort(kk, backend=_e, config=config)

                    out_v = jax.jit(f)(keys)
                    out_k = None
                    dt = measure_seconds_per_call(jax.jit(f), keys, reps=4)
                else:
                    def f(kk, _e=engine):
                        return vk.sort(kk, backend=_e, config=config)

                    out_k = jax.jit(f)(keys)
                    if dtype.kind in "fi":
                        # the timing chain remixes uint bits between reps;
                        # carry float/signed keys as their unsigned bit
                        # pattern and reinterpret inside the timed fn
                        cdt = jnp.uint32 if dtype.itemsize == 4 else jnp.uint64
                        jdt = jnp.dtype(dtype)

                        def f_bits(kb, _e=engine, _c=cdt, _j=jdt):
                            return vk.sort(kb.view(_j), backend=_e,
                                           config=config).view(_c)

                        dt = measure_seconds_per_call(
                            jax.jit(f_bits), keys.view(cdt), reps=4
                        )
                    else:
                        dt = measure_seconds_per_call(jax.jit(f), keys, reps=4)
            except Exception as e:
                log(f"  {engine:12s} n={n:>12,}: FAILED {type(e).__name__}: {str(e)[:100]}")
                continue

            if oracle is not None:
                exact = out_k is None or bool(
                    np.array_equal(np.asarray(out_k), oracle)
                )
                if op == "kv_unstable":
                    # any tie order is valid: verify sorted keys bitwise +
                    # the (key, value) pair multiset, not the stable
                    # permutation (which only the stable ops promise)
                    got = out_v if isinstance(out_v, tuple) else (out_v,)
                    vin = values if isinstance(values, tuple) else (values,)
                    for v_in, v_out in zip(vin, got):
                        cols_in = (np.asarray(v_in), k_np)
                        cols_out = (np.asarray(v_out), np.asarray(out_k))
                        oi = np.lexsort(cols_in)
                        oo = np.lexsort(cols_out)
                        exact = exact and all(
                            bool(np.array_equal(ci[oi], co[oo]))
                            for ci, co in zip(cols_in, cols_out)
                        )
                elif op != "keys":
                    perm = np.argsort(k_np, kind="stable")
                    if args.payload == "u64":
                        exp = perm.astype(np.uint64)
                    elif args.payload == "u32x2":
                        exp = (perm.astype(np.uint32), ~perm.astype(np.uint32))
                    else:
                        exp = perm.astype(np.uint32)
                    got = out_v if isinstance(out_v, tuple) else (out_v,)
                    want = exp if isinstance(exp, tuple) else (exp,)
                    exact = exact and len(got) == len(want) and all(
                        bool(np.array_equal(np.asarray(g), w))
                        for g, w in zip(got, want)
                    )
            elif op == "argsort":
                # sampled: keys gathered through the permutation must ascend;
                # plus the device-side multiset check — the permutation's
                # value multiset must be exactly arange
                pv = np.asarray(out_v[:: max(n // 1_000_000, 1)]).astype(np.int64)
                o = k_np[pv]
                exact = bool((o[1:] >= o[:-1]).all())
                exact = exact and _multiset_ok(jnp, np, jnp.arange(
                    n, dtype=out_v.dtype), out_v)
            else:
                o = np.asarray(out_k[:: max(n // 1_000_000, 1)])
                exact = bool((o[1:] >= o[:-1]).all())  # sampled sortedness
                # Device-side key-multiset histogram: sampled sortedness
                # alone passed a sorted-but-corrupted key plane in r5 (the
                # x64-off-truncated packed seed mapped keys to their low 17
                # bits; the ladder then sorted the corrupted plane
                # consistently). The multiset check catches any such
                # value-rewriting bug at bench scale for ~free.
                exact = exact and _multiset_ok(jnp, np, keys, out_k)
                if op in kv_ops and out_v is not None:
                    for v_in, v_out in zip(
                        values if isinstance(values, tuple) else (values,),
                        out_v if isinstance(out_v, tuple) else (out_v,),
                    ):
                        exact = exact and _multiset_ok(jnp, np, v_in, v_out)
            row = dict(
                engine=engine, n=n, dtype=args.dtype, op=op, kv=int(args.kv),
                payload=args.payload if op in kv_ops else "",
                distribution=args.distribution,
                tpu_ms=round(dt * 1e3, 4), cpu_ms=round(cpu_ms, 2),
                mkeys_per_s=round(n / dt / 1e6, 1), exact=int(exact),
            )
            append_row(row)
            nrows += 1
            log(f"  {engine:12s} n={n:>12,}: {dt*1e3:9.3f} ms  "
                f"{n/dt/1e6:8.1f} M/s  exact={exact}")

    log(f"wrote {nrows} rows to {args.csv}")


if __name__ == "__main__":
    main()
