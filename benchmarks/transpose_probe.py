"""Price the transpose-sandwich alternative for the network's sub-128 stages.

The r5b stage model (benchmarks/stage_bench.py) shows the 7 sub-granule
lane stages (d = 64..1) are the costliest block of every merge level
(~0.55 ms/plane per level at 3e7 vs 0.002-0.016 for reshape row stages):
each needs two ``pltpu.roll``s per plane because the exchange partners sit
within a 128-lane granule. This probe prices the one reformulation the r5
headroom statement left open: transpose (T/128, 128) -> (128, T/128) so
sub-128 LANE distances become SUBLANE distances, run the 7 stages as
layout-free sublane-split reshapes (the row-stage form), and transpose
back.

  bundle_rolls : the 7 lane stages as shipped (merge._lane_stage form)
  bundle_tpose : transpose + 7 sublane-reshape stages + transpose

Both bundles compute the same compare-exchange network (constant ascending
direction — cost-representative; the direction mask is a cheap iota-derived
select in both forms). Marginal cost from the K-repeat slope, DMA excluded,
exactly like stage_bench.

Usage:
    python benchmarks/transpose_probe.py --n 3e7 --tile-rows 64 --planes 1,2,3
    python benchmarks/transpose_probe.py --n 1e6 --cpu --reps 2   # smoke
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=float, default=3e7)
    ap.add_argument("--tile-rows", type=int, default=64)
    ap.add_argument("--planes", default="1,2,3")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0xBE7C)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vkradixsort_tpu.ops import merge
    from vkradixsort_tpu.utils.timing import measure_seconds_per_call

    interpret = jax.default_backend() != "tpu"
    mw = 0.0 if interpret else 0.25
    G = args.tile_rows
    C = merge.C
    T = G * C
    n = (int(args.n) // T) * T or T
    ntiles = n // T
    rng = np.random.default_rng(args.seed)
    log(f"devices: {jax.devices()}  n={n:,} G={G} T={T} ntiles={ntiles} "
        f"interpret={interpret}")

    SUB = [64, 32, 16, 8, 4, 2, 1]

    def run_variant(nplanes, nck, body, K):
        def kernel(*refs):
            ins, outs = refs[:nplanes], refs[nplanes:]
            planes = [r[:] for r in ins]
            flat = (
                jax.lax.broadcasted_iota(jnp.int32, (G, C), 0) * C
                + jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
            )
            for _ in range(K):
                planes = body(planes, flat)
            for o, p in zip(outs, planes):
                o[:] = p

        bs = pl.BlockSpec((T,), lambda t: (t,))
        call = pl.pallas_call(
            kernel,
            grid=(ntiles,),
            in_specs=[bs] * nplanes,
            out_specs=[bs] * nplanes,
            out_shape=[jax.ShapeDtypeStruct((n,), jnp.int32)] * nplanes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )

        def f(x):
            ps = [x[i * n : (i + 1) * n].view(jnp.int32) for i in range(nplanes)]
            out = call(*ps)
            return jnp.concatenate([o.view(jnp.uint32) for o in out])

        x0 = jnp.asarray(
            rng.integers(0, 1 << 32, size=nplanes * n, dtype=np.uint32)
        )
        return measure_seconds_per_call(
            jax.jit(f), x0, reps=args.reps, min_window=mw
        )

    def rolls_body(planes, flat, nck):
        # the 7 sub-128 stages exactly as the shipped network runs them
        for d in SUB:
            planes = merge._lane_stage(planes, nck, G, flat, d, 1)
        return planes

    def sublane_exchange(cols, nck, d):
        # cols: list of (128, Tg) planes; exchange at SUBLANE distance d
        # via the layout-free first-dim split (the row-stage form)
        nb2 = 128 // (2 * d)
        rs = [c.reshape(nb2, 2, d, cols[0].shape[1]) for c in cols]
        us = [r[:, 0] for r in rs]
        vs = [r[:, 1] for r in rs]
        le = merge._lex_le_i(us, vs, nck) == 1
        firsts = [jnp.where(le, u, v) for u, v in zip(us, vs)]
        seconds = [jnp.where(le, v, u) for u, v in zip(us, vs)]
        return [
            jnp.concatenate([f[:, None], s[:, None]], axis=1).reshape(
                128, cols[0].shape[1]
            )
            for f, s in zip(firsts, seconds)
        ]

    def tpose_body(planes, flat, nck):
        Tg = T // 128
        cols = [p.reshape(Tg, 128).T for p in planes]
        for d in SUB:
            cols = sublane_exchange(cols, nck, d)
        return [c.T.reshape(T) for c in cols]

    K_LO, K_HI = 1, 5
    for nplanes in [int(x) for x in args.planes.split(",")]:
        nck = min(nplanes, 2)
        log(f"--- nplanes={nplanes} nck={nck} ---")
        rows = []
        for name, body in [
            ("bundle_rolls", functools.partial(rolls_body, nck=nck)),
            ("bundle_tpose", functools.partial(tpose_body, nck=nck)),
        ]:
            t_lo = run_variant(nplanes, nck, body, K_LO)
            t_hi = run_variant(nplanes, nck, body, K_HI)
            per = (t_hi - t_lo) / (K_HI - K_LO)
            rows.append((name, per))
            log(f"{name:13s}: {per*1e3:8.3f} ms/bundle over {n:,} "
                f"({n/max(per,1e-12)/1e9:7.1f} G elem-bundles/s)")
        print(f"tpose nplanes={nplanes}: " + " ".join(
            f"{nm}={per*1e3:.3f}ms" for nm, per in rows
        ), flush=True)


if __name__ == "__main__":
    main()
