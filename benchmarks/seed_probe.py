"""Price the tilesort SEED variants for the syn_tie stable-kv pipeline.

The r5 profiler run showed the shipped stable-kv tilesort at 147.9 ms of
the 384 ms e2e (4% of HBM bandwidth — pure compute), roughly half of it
the XLA seed: ``jax.lax.sort`` over (key, payload) rows of width w with
``is_stable=True`` (ops/merge._segsort_seed). This probe prices the
equivalent seeds at 1e8 so the cheapest stable-order-preserving variant
can ship:

  * stable2   — the shipped seed: 2-operand stable sort, num_keys=1
  * iota3     — unstable 3-operand sort (key, row-iota, payload),
                num_keys=2: materializes the tie plane XLA's stable sort
                synthesizes internally
  * packed    — (key << log2(w)) | row-position packed into ONE u64 key,
                unstable 2-operand sort (packed, payload), num_keys=1:
                stability by construction, one comparator plane
                (needs jax_enable_x64; 32 + log2(w) <= 64 always holds)
  * keys1     — keys-only unstable (the keys-pipeline seed, for reference)

Each variant's output keys are checked equal against stable2's, and for
the tie-break invariant the permuted payloads must match exactly (ties in
row order). One line per (variant, width).

Usage:
    python benchmarks/seed_probe.py --n 1e8 --widths 8192,16384,32768
    python benchmarks/seed_probe.py --n 1e6 --cpu   # smoke
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--widths", default="16384")
    ap.add_argument("--seed", type=int, default=0xBE7C)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from vkradixsort_tpu.utils.timing import measure_pairs_seconds_per_call

    rng = np.random.default_rng(args.seed)
    log(f"devices: {jax.devices()}")

    for w in [int(x) for x in args.widths.split(",")]:
        n = (int(args.n) // w) * w
        rows = n // w
        wlog = int(np.ceil(np.log2(w)))
        # uint32 natural-order keys: the timing chain remixes uint bits,
        # and comparator cost is identical to the signed-order space the
        # engine uses
        k0 = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        v0 = jnp.arange(n, dtype=jnp.uint32)

        def stable2(k, v, _r=rows, _w=w):
            ks, vs = jax.lax.sort(
                (k.reshape(_r, _w), v[0].reshape(_r, _w)),
                dimension=1, num_keys=1, is_stable=True,
            )
            return ks.reshape(-1), (vs.reshape(-1),)

        def iota3(k, v, _r=rows, _w=w):
            ri = jnp.broadcast_to(
                jnp.arange(_w, dtype=jnp.int32), (_r, _w)
            )
            ks, _, vs = jax.lax.sort(
                (k.reshape(_r, _w), ri, v[0].reshape(_r, _w)),
                dimension=1, num_keys=2, is_stable=False,
            )
            return ks.reshape(-1), (vs.reshape(-1),)

        def packed(k, v, _r=rows, _w=w, _wl=wlog):
            ri = jnp.broadcast_to(
                jnp.arange(_w, dtype=jnp.uint64), (_r, _w)
            )
            # (key << wlog) | row_pos: one u64 comparator, stable by
            # construction (all packed values distinct within a row)
            kb = k.reshape(_r, _w)
            p = (kb.astype(jnp.uint64) << np.uint64(_wl)) | ri
            ps, vs = jax.lax.sort(
                (p, v[0].reshape(_r, _w)), dimension=1, num_keys=1,
                is_stable=False,
            )
            ks = (ps >> np.uint64(_wl)).astype(jnp.uint32)
            return ks.reshape(-1), (vs.reshape(-1),)

        def keys1(k, v, _r=rows, _w=w):
            ks = jax.lax.sort(
                (k.reshape(_r, _w),), dimension=1, is_stable=False
            )[0]
            return ks.reshape(-1), (v[0],)

        ref_k, ref_v = jax.jit(stable2)(k0, (v0,))
        ref_k, ref_v = np.asarray(ref_k), np.asarray(ref_v[0])
        for name, fn in [("stable2", stable2), ("iota3", iota3),
                         ("packed", packed), ("keys1", keys1)]:
            try:
                ok, ov = jax.jit(fn)(k0, (v0,))
                kmatch = bool(np.array_equal(np.asarray(ok), ref_k))
                vmatch = (name == "keys1") or bool(
                    np.array_equal(np.asarray(ov[0]), ref_v)
                )
                dt = measure_pairs_seconds_per_call(fn, k0, (v0,), reps=2)
            except Exception as e:  # pragma: no cover - device-dependent
                log(f"w={w} {name:8s}: FAILED {type(e).__name__}: {str(e)[:90]}")
                continue
            print(f"seed w={w} {name:8s}: {dt*1e3:8.2f} ms "
                  f"({n/dt/1e6:7.1f} M/s) keys_exact={int(kmatch)} "
                  f"stable_exact={int(vmatch)}", flush=True)


if __name__ == "__main__":
    main()
