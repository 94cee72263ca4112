"""Grain-size sweep — the analog of the reference's NUM_BLOCKS_PER_WORKGROUP
study (reference README.md:253-264, timings/radixsort_multi_<N>.png).

The reference's central tuning knob is NBPW (elements per thread); its
README sweeps it per N and picks the sweet spot. Here the structural
multi-pass engine (ops/samplesort.py) exposes the same axis as
``tile_target`` (elements per presorted tile) and ``bucket_target``
(elements per placed bucket); this CLI sweeps them on the real chip and
appends CSV rows

    n,tile_target,bucket_target,tpu_ms,mkeys_per_s,exact

Usage:
    python benchmarks/grain_sweep.py [--n 1e8] [--csv out.csv]
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
    ap.add_argument("--n", type=float, default=1e8)
    ap.add_argument("--tiles", default="19,20,21,22",
                    help="comma list of log2 tile_target values")
    ap.add_argument("--csv", default="grain_sweep.csv")
    ap.add_argument("--seed", type=int, default=0xBE7C)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vkradixsort_tpu.ops import samplesort
    from vkradixsort_tpu.utils.timing import measure_seconds_per_call

    n = int(args.n)
    rng = np.random.default_rng(args.seed)
    keys = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
    log(f"devices: {jax.devices()}  n={n:,}")

    rows = []
    for lt in [int(x) for x in args.tiles.split(",")]:
        tt = 1 << lt

        def f(kk, _tt=tt):
            return samplesort.sort_samplesort(kk, tile_target=_tt, bucket_target=_tt)

        out = jax.jit(f)(keys)
        # sampled sortedness at bench scale; exact oracle in tests/
        o = np.asarray(out[:: max(n // 1_000_000, 1)])
        exact = bool((o[1:] >= o[:-1]).all())
        dt = measure_seconds_per_call(jax.jit(f), keys, reps=2)
        rows.append(dict(n=n, tile_target=tt, bucket_target=tt,
                         tpu_ms=round(dt * 1e3, 2),
                         mkeys_per_s=round(n / dt / 1e6, 1), exact=int(exact)))
        log(f"  tile_target=2^{lt}: {dt*1e3:9.1f} ms  {n/dt/1e6:7.1f} M/s  exact={exact}")

    new = not os.path.exists(args.csv)
    with open(args.csv, "a", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        if new:
            w.writeheader()
        w.writerows(rows)
    log(f"wrote {len(rows)} rows to {args.csv}")


if __name__ == "__main__":
    main()
