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

``--syn-tie`` profiles the SHIPPED stable-kv pipeline (ops/merge.py
syn_tie: the tie-break plane is synthesized in VMEM, so stable kv moves
only 2 HBM planes): ``--planes`` then counts HBM planes (2 = key + one
u32 payload, the headline op) with nck=1 compare plane + the synthetic
one. Without it, planes are all carried through HBM (the round-3
position-plane composite — the A/B baseline).

Each component row also prints its HBM-roofline bound (bytes the pass
must move / 819 GB/s, utils/profiling.hbm_traffic_estimate discipline) so
the compute-vs-bandwidth question — the go/no-go for wider-merge /
window-narrowing redesigns — is answered by the same run that attributes
the time.

Usage:
    python benchmarks/profile_merge.py --n 1e8 --tile-rows 128 --planes 1,3
    python benchmarks/profile_merge.py --n 1e8 --planes 2 --syn-tie --segseed 16384
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
    ap.add_argument("--syn-tie", action="store_true",
                    help="profile the shipped stable-kv pipeline: --planes "
                         "counts HBM planes (nck=1 key plane + synthetic "
                         "in-VMEM tie plane + carried payloads)")
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
    syn = bool(args.syn_tie)
    # v5e HBM ~819 GB/s (BENCHMARKS.md roofline study); override per device
    hbm_bps = float(os.environ.get("VKRS_HBM_GBPS", "819")) * 1e9
    log(f"devices: {jax.devices()}  n={n:,} interpret={interpret} "
        f"segseed={seg} syn_tie={syn}")

    for nplanes in [int(x) for x in args.planes.split(",")]:
        if syn and nplanes < 2:
            log(f"--- nplanes={nplanes}: skipped (--syn-tie needs a payload "
                "plane; keys-only never carries a tie plane) ---")
            continue
        G = args.tile_rows or merge._default_tile_rows(nplanes)
        T = G * merge.C
        npad = round_up(max(n, T), T)
        buflen = npad + 2 * T
        ntiles_total = buflen // T
        nlev = max(int(np.ceil(np.log2(npad // T))), 0) if npad > T else 0
        # syn_tie: ONE compare plane in HBM (u32 key), tie plane synthesized
        # in VMEM; otherwise keys-only=1, argsort/kv compare (key, pos)
        nck = 1 if syn else min(nplanes, 2)
        tlog = int(np.log2(T))
        # HBM-roofline bounds (bytes each pass must move; lower bounds —
        # XLA's seed sort may take more than one read+write internally)
        chunks = merge._tilesort_chunks(tlog)
        npasses_tile = len(chunks)
        if seg:
            w = merge.C if seg is True else min(int(seg), T)
            wlog = int(np.log2(w))
            npasses_tile = 1 + sum(1 for klo, khi in chunks if khi > wlog)
        bytes_tile = npasses_tile * 2 * buflen * 4 * nplanes
        bytes_level = (ntiles_total * (2 * (T + merge.C) + T)) * 4 * nplanes
        roof_tile = bytes_tile / hbm_bps
        roof_level = bytes_level / hbm_bps
        roof_e2e = roof_tile + nlev * roof_level
        log(f"--- nplanes={nplanes} nck={nck} syn_tie={syn} G={G} T={T} "
            f"npad={npad:,} nlev={nlev} ---")

        # One flat uint32 array carries all planes through the timing chain
        # (the chain remixes it between reps, so every rep sees fresh bits).
        x0 = jnp.asarray(
            rng.integers(0, 1 << 32, size=nplanes * buflen, dtype=np.uint32)
        )

        def planes_of(x, _np_=nplanes, _b=buflen):
            return [x[i * _b : (i + 1) * _b].view(jnp.int32) for i in range(_np_)]

        def f_tilesort(x):
            out = merge._tilesort_call(
                planes_of(x), nplanes, nck, G, interpret, segseed=seg,
                syn_tie=syn,
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
            out = merge._mergepath_call(
                pl_, meta, nplanes, nck, G, interpret, syn_tie=syn
            )
            return jnp.concatenate([o.view(jnp.uint32) for o in out])

        t_tile = measure_seconds_per_call(jax.jit(f_tilesort), x0, reps=2, min_window=mw)
        log(f"tilesort (all chunks): {t_tile*1e3:9.2f} ms   "
            f"roofline {roof_tile*1e3:7.2f} ms ({roof_tile/t_tile:5.1%} of BW)")
        t_split = measure_seconds_per_call(jax.jit(f_split), x0, reps=2, min_window=mw)
        log(f"split (XLA search):    {t_split*1e3:9.2f} ms")
        t_level = measure_seconds_per_call(jax.jit(f_level), x0, reps=2, min_window=mw)
        log(f"level (split+kernel):  {t_level*1e3:9.2f} ms   "
            f"({t_level*1e3/max(nplanes,1):.2f} ms/plane)   "
            f"roofline {roof_level*1e3:7.2f} ms ({roof_level/t_level:5.1%} of BW)")

        # end-to-end through the public engine entry (keys-only shape: the
        # e2e row is about ladder overheads, not payload reassembly)
        keys = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        if syn:
            # the shipped stable-kv pipeline: nck=1 + synthetic tie plane,
            # nplanes-1 carried payloads (sort_merge defaults to syn_tie
            # for stable kv unless VKRS_MERGE_STABLE_POS=1)
            def f_e2e(k):
                ek, evs = merge.sort_merge(
                    k, (jnp.arange(k.shape[0], dtype=jnp.uint32),) * (nplanes - 1),
                    stable=True, tile_rows=G, interpret=interpret, segseed=seg,
                )
                return ek
        elif nplanes == 1:
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
            f"gap = {(t_e2e-model)*1e3:+.2f} ms   "
            f"roofline {roof_e2e*1e3:.2f} ms ({roof_e2e/t_e2e:.1%} of BW)")
        print(f"profile nplanes={nplanes} G={G} syn_tie={int(syn)}: "
              f"tilesort={t_tile*1e3:.2f}ms "
              f"split={t_split*1e3:.2f}ms level={t_level*1e3:.2f}ms "
              f"nlev={nlev} e2e={t_e2e*1e3:.2f}ms "
              f"roofline_e2e={roof_e2e*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
