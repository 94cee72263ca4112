"""Component cost attribution for the merge engine (ops/merge.py).

The end-to-end merge sweep (benchmarks/sweep.py --engines merge) decides the
routing question; THIS tool answers the optimization question: where does a
merge sort's time actually go? It times, at a given N and grain, on whatever
backend is attached:

  * tilesort  — the chunked in-VMEM bitonic tile-sort pass (all chunks);
  * split     — one level's XLA merge-path binary search (metadata only);
  * level     — one full run-doubling level (split + streaming window-merge
                Pallas kernel over every output tile);
  * e2e       — the public sort_merge end-to-end;
  * model     — tilesort + nlev * level, to expose any gap between component
                costs and the end-to-end time (dispatch overhead, fori_loop
                level chaining, pad/concat).

The reference has no per-pass attribution at all (wall clock around the
whole submit, reference singleradixsort/src/SingleRadixSort.cpp:26-31); this
is the TPU-side upgrade that the round-2 "4.8 ms/plane/level" component
claim should have been backed by.

Usage:
    python benchmarks/profile_merge.py --n 1e8 --tile-rows 128 --planes 1,3
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
    ap.add_argument("--tile-rows", type=int, default=None,
                    help="grain G (VMEM rows of 2048); default = engine default")
    ap.add_argument("--planes", default="1,3",
                    help="comma list of total plane counts to profile "
                         "(1 = keys-only u32, 2 = argsort, 3 = stable kv)")
    ap.add_argument("--seed", type=int, default=0xBE7C)
    ap.add_argument("--segseed", default="0",
                    help="tilesort segseed: 0/1 or a power-of-two width; env "
                         "VKRS_MERGE_SEGSEED overrides (same resolution as "
                         "the engine, so the tilesort COMPONENT row always "
                         "measures the same seed the e2e row runs)")
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

    from vkradixsort_tpu.ops import merge
    from vkradixsort_tpu.ops.common import round_up
    from vkradixsort_tpu.utils.timing import measure_seconds_per_call

    interpret = jax.default_backend() != "tpu"
    # CPU-interpret dry runs: keep the timing window tiny, or the adaptive
    # reps growth recompiles ever-longer interpret chains (~17 s/compile).
    mw = float(os.environ.get("VKRS_PROFILE_MIN_WINDOW",
                              "0.25" if not interpret else "0.0"))
    n = int(args.n)
    rng = np.random.default_rng(args.seed)
    # Resolve the seed ONCE, through the engine's own env/arg precedence:
    # every component row below then measures the exact configuration the
    # e2e row (and the session scripts' env-driven A/Bs) run.
    iv = int(args.segseed)
    seg = merge._env_segseed(bool(iv) if iv in (0, 1) else iv)
    log(f"devices: {jax.devices()}  n={n:,} interpret={interpret} segseed={seg}")

    for nplanes in [int(x) for x in args.planes.split(",")]:
        G = args.tile_rows or merge._default_tile_rows(nplanes)
        T = G * merge.C
        npad = round_up(max(n, T), T)
        buflen = npad + 2 * T
        ntiles_total = buflen // T
        nlev = max(int(np.ceil(np.log2(npad // T))), 0) if npad > T else 0
        nck = min(nplanes, 2)  # keys-only=1; argsort/kv compare (key, pos)
        log(f"--- nplanes={nplanes} nck={nck} G={G} T={T} npad={npad:,} "
            f"nlev={nlev} ---")

        # One flat uint32 array carries all planes through the timing chain
        # (the chain remixes it between reps, so every rep sees fresh bits).
        x0 = jnp.asarray(
            rng.integers(0, 1 << 32, size=nplanes * buflen, dtype=np.uint32)
        )

        def planes_of(x, _np_=nplanes, _b=buflen):
            return [x[i * _b : (i + 1) * _b].view(jnp.int32) for i in range(_np_)]

        def f_tilesort(x):
            out = merge._tilesort_call(
                planes_of(x), nplanes, nck, G, interpret, segseed=seg
            )
            return jnp.concatenate([o.view(jnp.uint32) for o in out])

        def f_split(x):
            pl_ = planes_of(x)
            meta = merge._level_splits(pl_, nck, jnp.int32(T), T, npad, ntiles_total)
            # fold metadata into the carried array so nothing is dead code
            return x.at[0].set(jnp.sum(meta[:, 0]).astype(jnp.uint32))

        def f_level(x):
            pl_ = planes_of(x)
            meta = merge._level_splits(pl_, nck, jnp.int32(T), T, npad, ntiles_total)
            out = merge._mergepath_call(pl_, meta, nplanes, nck, G, interpret)
            return jnp.concatenate([o.view(jnp.uint32) for o in out])

        t_tile = measure_seconds_per_call(jax.jit(f_tilesort), x0, reps=2, min_window=mw)
        log(f"tilesort (all chunks): {t_tile*1e3:9.2f} ms")
        t_split = measure_seconds_per_call(jax.jit(f_split), x0, reps=2, min_window=mw)
        log(f"split (XLA search):    {t_split*1e3:9.2f} ms")
        t_level = measure_seconds_per_call(jax.jit(f_level), x0, reps=2, min_window=mw)
        log(f"level (split+kernel):  {t_level*1e3:9.2f} ms   "
            f"({t_level*1e3/max(nplanes,1):.2f} ms/plane)")

        # end-to-end through the public engine entry (keys-only shape: the
        # e2e row is about ladder overheads, not payload reassembly)
        keys = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        if nplanes == 1:
            def f_e2e(k):
                out, _ = merge.sort_merge(
                    k, (), tile_rows=G, interpret=interpret, segseed=seg
                )
                return out
        elif nplanes == 2:
            def f_e2e(k):
                return merge.argsort_merge(
                    k, tile_rows=G, interpret=interpret, segseed=seg
                )
        else:
            def f_e2e(k):
                ek, evs = merge.sort_merge(
                    k, (jnp.arange(k.shape[0], dtype=jnp.uint32),) * (nplanes - 2),
                    tile_rows=G, interpret=interpret, segseed=seg,
                )
                return ek
        t_e2e = measure_seconds_per_call(jax.jit(f_e2e), keys, reps=2, min_window=mw)
        model = t_tile + nlev * t_level
        log(f"e2e sort_merge:        {t_e2e*1e3:9.2f} ms   "
            f"model tilesort+{nlev}*level = {model*1e3:.2f} ms   "
            f"gap = {(t_e2e-model)*1e3:+.2f} ms")
        print(f"profile nplanes={nplanes} G={G}: tilesort={t_tile*1e3:.2f}ms "
              f"split={t_split*1e3:.2f}ms level={t_level*1e3:.2f}ms "
              f"nlev={nlev} e2e={t_e2e*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
