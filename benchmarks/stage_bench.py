"""Per-stage cost model for the merge engine's in-VMEM network (ops/merge.py).

profile_merge.py attributes WHOLE components (tilesort / level / e2e); this
tool prices the network's individual building blocks with DMA excluded —
grid-tiled Pallas kernels that load a T-block into VMEM, repeat ONE kind of
stage K times, and write back, so (cost(K2) - cost(K1)) / (K2 - K1) isolates
the marginal per-stage cost from the fixed load/store:

  * row    — compare-exchange at element distance >= 2048 (reshape view,
             pure copies + selects: merge._row_stage)
  * lane   — compare-exchange at lane distance d < 2048 (two static
             pltpu.rolls + select: merge._lane_stage), at d in {1, 64, 1024}
  * net    — one full log2(T)-stage merge level (merge._net_level, the
             in-VMEM half of every ladder level)
  * select — the lowest-half lex select (the ladder's other in-VMEM half)

This is the evidence base for ladder-depth decisions (VERDICT r4 task 2):
a 4-way merge level replaces, per 4x run growth, two binary levels'
{2 selects + 2 nets + 2 window DMAs + 2 writes} with {3 selects + 3 nets +
1 (doubled) window DMA + 1 write}. Whether that wins is decided by the
measured ratio of net/select compute to the DMA the lookahead can hide.

Usage:
    python benchmarks/stage_bench.py --n 3e7 --tile-rows 64 --planes 1,2
    python benchmarks/stage_bench.py --n 1e6 --cpu --reps 2   # smoke
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
    ap.add_argument("--planes", default="1,2")
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

    def run_variant(nplanes, nck, body, K):
        """Grid-tiled kernel: load nplanes T-blocks, apply body(planes) K
        times, store. Returns seconds/call over the whole array."""

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

    def row_body(planes, flat, nck):
        return merge._row_stage(planes, nck, G, G // 2, 1)

    def lane_body(planes, flat, nck, d):
        return merge._lane_stage(planes, nck, G, flat, d, 1)

    def net_body(planes, flat, nck):
        return merge._net_level(planes, nck, G, flat, T, final_dir=1)

    def select_body(planes, flat, nck):
        # lowest-half lex select between the planes and a rolled copy — the
        # comparator + select cost of the ladder's per-tile combine
        other = [jnp.roll(p, 1, axis=1) for p in [q.reshape(G, C) for q in planes]]
        le = merge._lex_le_i([p.reshape(G, C) for p in planes], other, nck) == 1
        return [
            jnp.where(le, p.reshape(G, C), o).reshape(T)
            for p, o in zip(planes, other)
        ]

    K_LO, K_HI = 2, 10  # marginal cost from the K-slope
    for nplanes in [int(x) for x in args.planes.split(",")]:
        nck = min(nplanes, 2)
        log(f"--- nplanes={nplanes} nck={nck} ---")
        rows = []
        variants = [
            ("row(d=G/2*C)", functools.partial(row_body, nck=nck)),
            ("lane(d=1)", functools.partial(lane_body, nck=nck, d=1)),
            ("lane(d=64)", functools.partial(lane_body, nck=nck, d=64)),
            ("lane(d=1024)", functools.partial(lane_body, nck=nck, d=1024)),
            ("select(lex)", functools.partial(select_body, nck=nck)),
        ]
        for name, body in variants:
            t_lo = run_variant(nplanes, nck, body, K_LO)
            t_hi = run_variant(nplanes, nck, body, K_HI)
            per = (t_hi - t_lo) / (K_HI - K_LO)
            rows.append((name, per))
            log(f"{name:14s}: {per*1e3:8.3f} ms/stage over {n:,} "
                f"({n/max(per,1e-12)/1e9:7.1f} G elem-stages/s)")
        # one full merge level's in-VMEM half, measured directly (K=1 vs
        # K=2 slope removes the load/store)
        t1 = run_variant(nplanes, nck, functools.partial(net_body, nck=nck), 1)
        t2 = run_variant(nplanes, nck, functools.partial(net_body, nck=nck), 2)
        log(f"net(level T):   {(t2-t1)*1e3:8.3f} ms/level-net "
            f"(fixed load/store+overhead {max(2*t1-t2,0)*1e3:.3f} ms)")
        print(f"stage nplanes={nplanes}: " + " ".join(
            f"{nm}={per*1e3:.3f}ms" for nm, per in rows
        ) + f" net={(t2-t1)*1e3:.3f}ms", flush=True)


if __name__ == "__main__":
    main()
