"""Grain-size sweep — the analog of the reference's NUM_BLOCKS_PER_WORKGROUP
study (reference README.md:253-283, timings/radixsort_multi_<N>.png).

The reference's central tuning knob is NBPW (elements per thread); its
README sweeps it per N (seven sizes, 1e2..1e8) and picks the sweet spot per
size. The TPU engines expose the same axis:

  * ``samplesort``: ``tile_target`` / ``bucket_target`` (elements per
    presorted tile / placed bucket);
  * ``merge``: ``tile_rows`` (VMEM rows of 2048 per tile — tile elements
    T = tile_rows * 2048, the run length the ladder starts from).

This CLI sweeps the knob per engine ACROSS sizes on the real chip and
appends CSV rows

    engine,n,grain,tpu_ms,mkeys_per_s,exact

where ``grain`` is elements-per-tile for both engines (log2). The measured
optima feed the dispatcher's per-N tuning table
(vkradixsort_tpu/engine/config.py GRAIN_TABLE).

Usage:
    python benchmarks/grain_sweep.py --engine merge --sizes 1e6,1e7,1e8
    python benchmarks/grain_sweep.py --engine samplesort --n 1e8
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engine", default="samplesort",
                    choices=["samplesort", "merge"])
    ap.add_argument("--n", type=float, default=None,
                    help="single size (back-compat; overrides --sizes)")
    ap.add_argument("--sizes", default="1e5,1e6,1e7,1e8",
                    help="comma list of N (floats ok)")
    ap.add_argument("--tiles", default=None,
                    help="comma list of log2 elements-per-tile values "
                         "(default 19,20,21,22 for samplesort; "
                         "16,17,18,19 for merge)")
    ap.add_argument("--kv", action="store_true",
                    help="sweep the stable kv pipeline instead of keys-only")
    ap.add_argument("--csv", default="grain_sweep.csv")
    ap.add_argument("--seed", type=int, default=0xBE7C)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (dry runs; avoids probing a "
                         "possibly-down TPU tunnel)")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        # after `import jax`: the axon sitecustomize overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vkradixsort_tpu.utils.timing import (
        measure_pairs_seconds_per_call,
        measure_seconds_per_call,
    )

    # off-TPU the Pallas engines run in interpreter mode (CPU smoke runs)
    interpret = jax.default_backend() != "tpu"
    sizes = ([int(args.n)] if args.n is not None
             else [int(float(x)) for x in args.sizes.split(",")])
    default_tiles = "16,17,18,19" if args.engine == "merge" else "19,20,21,22"
    tile_logs = [int(x) for x in (args.tiles or default_tiles).split(",")]
    rng = np.random.default_rng(args.seed)
    log(f"devices: {jax.devices()}  engine={args.engine} sizes={sizes} "
        f"tiles=2^{tile_logs} kv={args.kv}")

    def append_row(row):
        # one row per (n, grain) point, flushed IMMEDIATELY: a step timeout
        # mid-sweep keeps every point already measured (the session runner
        # kills whole steps, and compiles dominate — losing a finished 1e8
        # point to a later timeout costs ~4 min of chip time to re-measure)
        new = not os.path.exists(args.csv)
        with open(args.csv, "a", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(row.keys()))
            if new:
                w.writeheader()
            w.writerow(row)

    nrows = 0
    for n in sizes:
        keys = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        values = jnp.arange(n, dtype=jnp.uint32) if args.kv else None
        for lt in tile_logs:
            tt = 1 << lt
            if args.engine == "merge":
                from vkradixsort_tpu.ops import merge

                tile_rows = max(tt // merge.C, 2)
                if tile_rows * merge.C > max(n, 1) * 4:
                    continue  # tile absurdly larger than the input

                if args.kv:
                    def f(kk, vv, _g=tile_rows):
                        ek, evs = merge.sort_merge(
                            kk, (vv,), tile_rows=_g, interpret=interpret
                        )
                        return ek, evs[0]
                else:
                    def f(kk, _g=tile_rows):
                        ek, _ = merge.sort_merge(
                            kk, (), tile_rows=_g, interpret=interpret
                        )
                        return ek
            else:
                from vkradixsort_tpu.ops import samplesort

                if args.kv:
                    def f(kk, vv, _tt=tt):
                        return samplesort.sort_pairs_samplesort(
                            kk, vv, tile_target=_tt, bucket_target=_tt
                        )
                else:
                    def f(kk, _tt=tt):
                        return samplesort.sort_samplesort(
                            kk, tile_target=_tt, bucket_target=_tt
                        )

            try:
                if args.kv:
                    out, _ = jax.jit(f)(keys, values)
                else:
                    out = jax.jit(f)(keys)
            except Exception as e:
                log(f"  n={n:>12,} grain=2^{lt}: FAILED "
                    f"{type(e).__name__}: {str(e)[:90]}")
                continue
            # sampled sortedness at bench scale; exact oracle in tests/
            o = np.asarray(out[:: max(n // 1_000_000, 1)])
            exact = bool((o[1:] >= o[:-1]).all())
            if args.kv:
                dt = measure_pairs_seconds_per_call(f, keys, values, reps=args.reps)
            else:
                dt = measure_seconds_per_call(jax.jit(f), keys, reps=args.reps)
            append_row(dict(engine=args.engine, n=n, grain=tt,
                            kv=int(args.kv), tpu_ms=round(dt * 1e3, 2),
                            mkeys_per_s=round(n / dt / 1e6, 1),
                            exact=int(exact)))
            nrows += 1
            log(f"  n={n:>12,} grain=2^{lt}: {dt*1e3:9.1f} ms  "
                f"{n/dt/1e6:7.1f} M/s  exact={exact}")

    log(f"wrote {nrows} rows to {args.csv}")


if __name__ == "__main__":
    main()
