"""Merge-path large-N engine: in-VMEM tile sorts + streaming bitonic merges.

This is the round-2 flagship — the TPU answer to the reference's fastest
path, its multi-workgroup pipeline (reference
multiradixsort/resources/shaders/multi_radixsort.comp:45-126). The reference
wins large N by tiling the array over workgroups and scattering through a
global histogram table; TPUs lose that game (element scatter ~150 M/s,
BENCHMARKS.md), but they win a different one: streaming bulk DMA + a very
wide VPU. So the structure here is a run-doubling MERGE ladder where every
level is ONE bandwidth-bound pass over HBM:

  1. "tilesort" Pallas kernel: each T-element tile (T = G*2048) is sorted
     entirely in VMEM by the textbook bitonic network (~log^2 stages of
     vectorized compare-exchange) — one HBM pass turns raw input into
     sorted-T runs;
  2. per run-doubling level L = T, 2T, ...: merge-path split points for every
     output tile are computed in XLA (a vectorized binary search over the
     sorted runs — a few hundred queries, microseconds), then a Pallas
     kernel, per output tile, DMAs one row-aligned window from each input
     run, shift-aligns them in VMEM with dynamic lane rolls, masks the
     invalid window region with sentinels, takes the elementwise
     lexicographic minimum of the two halves (the bitonic lowest-half
     property: exactly the output tile's multiset), and sorts it with one
     log2(T)-stage bitonic merge.

The ladder stores runs in ALTERNATING direction — even runs ascending, odd
runs descending (the natural orientation of the bitonic network): rev(B) of
the merge-path window is then a contiguous FORWARD read of the descending
storage (sentinel mask on the head instead of the tail), so A' ++ B-window
is bitonic with zero in-kernel reversal stages. The final in-VMEM merge
emits the output tile in the direction its own run needs (a comparator
flip) and the output block index is mirrored within descending runs via the
scalar-prefetch metadata; the last level's single run 0 is even = ascending.

Measured COMPONENT cost on v5e at 1e8 (BENCHMARKS.md): one full 18-stage
streamed merge pass is 4.8 ms/plane, ~3 s compile. Whether the end-to-end
ladder (tilesort chunks + ~10 run-doubling levels + the double-window DMA's
>= (T+C)/T read amplification) beats XLA's 179 ms flat sort is decided by
the committed end-to-end sweeps in benchmarks/results/ and the routing rows
in engine/config.ROUTE_TABLE — not by this extrapolation.

Stage implementation notes (all stages are statically unrolled — measured
both compile-fast AND runtime-fast; dynamic-distance fori variants compile
equally fast but run 1.5-4x slower because dynamic rolls lower poorly):

  * element distance d >= 2048: reshape-row stages on the (G, 2048) view —
    reshape to (nb, 2, dr, 2048), lexicographic min/max the two halves,
    concatenate back (pure copies + selects, no rolls);
  * d <= 1024: lane stages — the XOR-partner is materialized with two
    static ``pltpu.roll``s and a lane-mask select.

Everything runs on PLANES of int32 in signed-order space (see ops/segsort):
the first ``nck`` planes compare lexicographically (key, then original
position for stability — the same mechanism as parallel/distributed.py and
ops/samplesort.py), the rest are carried payload. 64-bit keys become two
planes (hi, lo). All comparisons are strict total orders once a position
plane rides along, so the (unstable) bitonic network yields a STABLE sort.

Alignment rules (see memory: axon-tpu-gotchas): window DMA offsets are
floored to the 2048-element row, which satisfies the 1024-divisibility the
1-D HBM memref tiling demands; the sub-row remainder is realigned in VMEM
with two dynamic rolls and a select.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkradixsort_tpu.ops.common import round_up

C = 2048  # row width of the VMEM view; also the window-DMA alignment grain
_SENT = np.int32(np.iinfo(np.int32).max)  # compare-plane sentinel (+inf)


# ---------------------------------------------------------------------------
# comparators (integer masks: Mosaic rejects bool<->bool not/xor)


def _lex_le_i(a_planes, b_planes, nck):
    """1 where a <= b lexicographically over the first nck planes, else 0."""
    m = jnp.where(a_planes[nck - 1] <= b_planes[nck - 1], 1, 0)
    for k in range(nck - 2, -1, -1):
        m = jnp.where(a_planes[k] < b_planes[k], 1, 0) + jnp.where(
            a_planes[k] == b_planes[k], 1, 0
        ) * m
    return m


def _lex_lt_gt_i(a_planes, b_planes, nck):
    """(a < b, a > b) lexicographic masks in ONE pass over the planes.

    The lane stages need both directions of the strict comparison; evaluating
    them as two independent lexicographic scans would redo every per-plane
    compare. Here each plane contributes one ``<`` and one ``>`` compare and
    the shared equality mask is derived arithmetically (1 - lt - gt) — for
    nck > 1 this roughly halves the comparator cost of the (suspected
    VPU-compute-bound) merge-level kernel's lane stages.
    """
    lt = jnp.where(a_planes[nck - 1] < b_planes[nck - 1], 1, 0)
    gt = jnp.where(b_planes[nck - 1] < a_planes[nck - 1], 1, 0)
    for k in range(nck - 2, -1, -1):
        l_k = jnp.where(a_planes[k] < b_planes[k], 1, 0)
        g_k = jnp.where(b_planes[k] < a_planes[k], 1, 0)
        e_k = 1 - l_k - g_k
        lt = l_k + e_k * lt
        gt = g_k + e_k * gt
    return lt, gt


# ---------------------------------------------------------------------------
# network stages over flat (T,) planes, T = G * C


def _row_stage(planes, nck, G, dr, asc_nb):
    """Compare-exchange at element distance dr*C via the (G, C) row view.

    asc_nb: (nb, 1, 1) int mask (1 = ascending 2*dr-row block), or the
    constant 1 for an all-ascending network level.
    """
    nb = G // (2 * dr)
    rs = [p.reshape(nb, 2, dr, C) for p in planes]
    us = [r[:, 0] for r in rs]
    vs = [r[:, 1] for r in rs]
    le = _lex_le_i(us, vs, nck)
    first_is_u = jnp.where(asc_nb == 1, le, 1 - le) == 1
    firsts = [jnp.where(first_is_u, u, v) for u, v in zip(us, vs)]
    seconds = [jnp.where(first_is_u, v, u) for u, v in zip(us, vs)]
    return [
        jnp.concatenate([f[:, None], s[:, None]], axis=1).reshape(G * C)
        for f, s in zip(firsts, seconds)
    ]


def _mid_stage(planes, nck, G, d, k, final_dir):
    """Compare-exchange at lane distance d for 128 <= d <= C/2, roll-free.

    The r5b stage bench (benchmarks/stage_bench.py, v5e) priced a roll-based
    lane stage at 27-60x a reshape-based row stage — the two ``pltpu.roll``s
    per plane dominate. For d >= 128 the exchange partners are whole
    128-lane granules, so the same reshape trick the row stages use applies
    INSIDE the lane dimension: view (G, C) as (G, C/(2d), 2, d) and
    lex-min/max the axis-2 halves — pure aligned selects, no shuffles.
    Below 128 the partners cross lanes within a granule and the roll form
    stays (_lane_stage).

    The direction mask is constant per 2d-block: block (g, b) starts at
    flat = g*C + b*2d, and the network rule reads only bits >= log2(k) >
    log2(2d) of flat, so it broadcasts as (G, C/(2d), 1, 1).
    """
    nb2 = C // (2 * d)
    rs = [p.reshape(G, nb2, 2, d) for p in planes]
    us = [r[:, :, 0] for r in rs]
    vs = [r[:, :, 1] for r in rs]
    if final_dir is None:
        gi = jax.lax.broadcasted_iota(jnp.int32, (G, nb2, 1), 0)
        bi = jax.lax.broadcasted_iota(jnp.int32, (G, nb2, 1), 1)
        asc = jnp.where(((gi * C + bi * (2 * d)) & k) == 0, 1, 0)
    else:
        asc = final_dir
    le = _lex_le_i(us, vs, nck)
    first_is_u = jnp.where(asc == 1, le, 1 - le) == 1
    firsts = [jnp.where(first_is_u, u, v) for u, v in zip(us, vs)]
    seconds = [jnp.where(first_is_u, v, u) for u, v in zip(us, vs)]
    return [
        jnp.concatenate([f[:, :, None], s[:, :, None]], axis=2).reshape(G * C)
        for f, s in zip(firsts, seconds)
    ]


def _lane_stage(planes, nck, G, flat, d, asc):
    """Compare-exchange at lane distance d (static, <= C/2).

    asc: int mask broadcastable to (G, C) (1 = ascending direction block),
    or the constant 1.
    """
    planes2d = [p.reshape(G, C) for p in planes]
    lower = jnp.where((flat & d) == 0, 1, 0)
    partners = []
    for p in planes2d:
        pr = pltpu.roll(p, C - d, 1)  # == roll by -d: partner at lane+d
        pb = pltpu.roll(p, d, 1)  # partner at lane-d
        partners.append(jnp.where(lower == 1, pr, pb))
    plt, pgt = _lex_lt_gt_i(partners, planes2d, nck)
    want_lo = jnp.where(lower == asc, 1, 0)
    take = jnp.where(want_lo == 1, plt, pgt) == 1
    return [
        jnp.where(take, q, p).reshape(G * C) for p, q in zip(planes2d, partners)
    ]


def _sub128_stages(planes, nck, G, k, final_dir, d_hi):
    """Transpose-sandwich for the sub-granule stages d = d_hi..1 (d_hi <=
    64) of level ``k``: ONE pair of (T/128, 128) transposes converts the
    lane distances the VPU can only reach by rolls into SUBLANE distances,
    so each stage becomes the layout-free first-dim split the row stages
    use — no rolls at all. The r5 probe (benchmarks/transpose_probe.py,
    v5e) priced the 7-stage bundle at 0.36 ms vs 0.82 for the roll form at
    3e7 x 1 plane — the transposes amortize over the whole bundle, which
    is why this wins where the per-stage reshape (_mid_stage) lost.

    In the transposed (128, T/128) view, element (j, g) is flat index
    i = g*128 + j, so exchange partners at distance d < 128 share a column
    g and the direction mask splits cleanly: for k >= 128 it reads only
    bits of g (constant per column); for k < 128 only bits of j above
    log2(2d), i.e. the block index (constant per 2d-block of rows).
    """
    T = G * C
    Tg = T // 128
    cols = [p.reshape(Tg, 128).T for p in planes]
    d = d_hi
    while d >= 1:
        nb2 = 128 // (2 * d)
        rs = [c.reshape(nb2, 2, d, Tg) for c in cols]
        us = [r[:, 0] for r in rs]
        vs = [r[:, 1] for r in rs]
        if final_dir is None:
            if k >= 128:
                gi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Tg), 2)
                asc = jnp.where(((gi * 128) & k) == 0, 1, 0)
            else:
                bi = jax.lax.broadcasted_iota(jnp.int32, (nb2, 1, 1), 0)
                asc = jnp.where(((bi * (2 * d)) & k) == 0, 1, 0)
        else:
            asc = final_dir
        le = _lex_le_i(us, vs, nck)
        first_is_u = jnp.where(asc == 1, le, 1 - le) == 1
        firsts = [jnp.where(first_is_u, u, v) for u, v in zip(us, vs)]
        seconds = [jnp.where(first_is_u, v, u) for u, v in zip(us, vs)]
        cols = [
            jnp.concatenate([f[:, None], s[:, None]], axis=1).reshape(128, Tg)
            for f, s in zip(firsts, seconds)
        ]
        d >>= 1
    return [c.T.reshape(T) for c in cols]


def _tpose_on() -> bool:
    """Trace-time A/B hatch for the transpose-sandwich sub-128 stages.

    VKRS_MERGE_TPOSE=0 restores the all-roll schedule (the round-4
    baseline); the default follows the measured winner."""
    import os

    return os.environ.get("VKRS_MERGE_TPOSE", "1") != "0"


def _midstage_on() -> bool:
    """Trace-time A/B hatch for the roll-free mid stages (d in [128, C/2]).

    Default OFF — a measured NEGATIVE result (r5d, v5e): the r5b stage
    bench priced roll-based lane stages at 27-60x reshape-based row
    stages, but re-expressing the granule-aligned distances as reshape
    selects made stable kv at 1e8 22% SLOWER e2e (472.2 ms vs 386.1,
    v5e_kv_impl_mid.csv) — splitting the LANE dimension forces Mosaic
    relayouts that cost more than the rolls they replace; only
    sublane-dimension reshapes (the row stages) are free. Kept as
    VKRS_MERGE_MIDSTAGE=1 for study."""
    import os

    return os.environ.get("VKRS_MERGE_MIDSTAGE", "0") != "0"


def _net_level(planes, nck, G, flat, k, final_dir):
    """All stages of bitonic level ``k`` (element distances k/2 .. 1).

    final_dir: None -> directions follow the standard (q & k) == 0 rule of
    the bitonic network (interior sort levels); otherwise an int mask
    (static or traced, 1 = ascending / 0 = descending) applied uniformly —
    the last sort level and the lowest-half merge, whose output direction
    alternates per run (module docstring).
    """
    mid = _midstage_on()
    tpose = _tpose_on()
    d = k >> 1
    while d >= C:
        dr = d // C
        if final_dir is None:
            nb = G // (2 * dr)
            bi = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)
            asc = jnp.where(((bi * (2 * d)) & k) == 0, 1, 0)
        else:
            asc = final_dir
        planes = _row_stage(planes, nck, G, dr, asc)
        d >>= 1
    while d >= 128 and mid:
        planes = _mid_stage(planes, nck, G, d, k, final_dir)
        d >>= 1
    while d >= 128 or (d >= 1 and not tpose):
        asc = (
            jnp.where((flat & k) == 0, 1, 0) if final_dir is None else final_dir
        )
        planes = _lane_stage(planes, nck, G, flat, d, asc)
        d >>= 1
    if d >= 1:
        planes = _sub128_stages(planes, nck, G, k, final_dir, d)
    return planes


# ---------------------------------------------------------------------------
# tilesort kernel: raw tiles -> sorted-T runs, one HBM pass
# (the analog of the reference's single-workgroup whole-sort regime feeding
# its multi-workgroup one: single_radixsort.comp:42-137 as the base case)


def _tilesort_kernel(nplanes, nck, G, klo, khi, tlog, syn_tie, *refs):
    ins = refs[:nplanes]
    outs = refs[nplanes:]
    planes = [r[:] for r in ins]
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (G, C), 0) * C
        + jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
    )
    if syn_tie:
        # Synthetic tie-break plane (costs ZERO HBM traffic — see
        # sort_merge_planes): within the tile the stable order of equal
        # keys IS their current position, except inside the network's
        # DESCENDING 2^(klo-1)-blocks (odd block parity), where the
        # previous chunk stored ties reversed — un-reverse with an XOR.
        idx = flat.reshape(G * C)
        if klo > 1:
            bs1 = np.int32((1 << (klo - 1)) - 1)
            desc = ((idx >> (klo - 1)) & 1) == 1
            syn = jnp.where(desc, idx ^ bs1, idx)
        else:
            syn = idx
        planes = planes[:nck] + [syn] + planes[nck:]
        nck += 1
    # runs alternate ascending (even tiles) / descending (odd tiles) so the
    # merge ladder's rev(B) is a contiguous forward read (module docstring);
    # only the final level's direction differs between the two.
    tile_dir = jnp.int32(1) - (pl.program_id(0) & 1)
    for klog in range(klo, khi + 1):
        planes = _net_level(
            planes,
            nck,
            G,
            flat,
            1 << klog,
            final_dir=tile_dir if klog == tlog else None,
        )
    if syn_tie:
        planes = planes[: nck - 1] + planes[nck:]
    for o, p in zip(outs, planes):
        o[:] = p


# Mosaic compile time is strongly superlinear in the number of statically
# unrolled stages (measured on v5e: ~36 stages -> 3.4 s, the full 171-stage
# network -> ~300 s), so the tile sort is CHUNKED into several kernels of
# at most ~_CHUNK_STAGES stages; each extra kernel costs one more HBM round
# trip (~2.4 ms/plane at 1e8), which is noise next to the compile savings.
_CHUNK_STAGES = 40


def _tilesort_chunks(tlog):
    """Partition bitonic levels 1..tlog into chunks of ~_CHUNK_STAGES stages
    (level k contributes k stages)."""
    chunks = []
    cur_lo, budget = 1, 0
    for klog in range(1, tlog + 1):
        if budget and budget + klog > _CHUNK_STAGES:
            chunks.append((cur_lo, klog - 1))
            cur_lo, budget = klog, 0
        budget += klog
    chunks.append((cur_lo, tlog))
    return chunks


def _stable_seed_sort(rows2d, nck):
    """Row-stable batched sort of ``rows2d`` (first nck planes compare):
    equal keys keep row order. Three bitwise-identical implementations —
    the r5 profiler attributed ~40% of the stable-kv e2e to the tilesort
    (4% of HBM bandwidth: pure comparator compute), so the seed ships the
    cheapest one the tracing context allows:

      * "packed" — (key << ceil(log2 w)) | row_pos as ONE u64 comparator,
        unstable: stability by construction, one compare plane. Single
        32-bit compare planes only, and ONLY under jax_enable_x64: lax
        canonicalizes explicitly-requested 64-bit dtypes under x64-off —
        broadcasted_iota(uint64) silently truncates to uint32, which would
        shift the key's high bits away. sort_merge_planes hoists the seed
        OUT of its Pallas x64-off tracing context so the caller's real
        x64 state governs here.
      * "iota"   — explicit row-iota tie plane, num_keys=nck+1, unstable:
        materializes what is_stable synthesizes; works everywhere.
      * "stable" — is_stable=True (the round-4 baseline).

    Env VKRS_MERGE_SEED_IMPL forces one (trace-time A/B, like the other
    merge hatches); default is "iota" — the r5b hardware session measured
    the three within noise standalone (w=16384 at 1e8: iota 82.4 ms,
    stable 82.9, packed 87.2 — benchmarks/seed_probe.py) and e2e (384.7 vs
    385.7 ms stable-kv under x64), with iota the consistent slight winner,
    and the packed e2e run DIED on the real chip (TPU FailedPrecondition
    at 1e8, r5b step 2_kv_e2e_packed) — so auto never selects packed; it
    stays env-forcible for study only.
    """
    import os

    impl = os.environ.get("VKRS_MERGE_SEED_IMPL", "auto")
    if impl not in ("auto", "packed", "iota", "stable"):
        raise ValueError(
            f"VKRS_MERGE_SEED_IMPL={impl!r}: pick packed, iota, or stable"
        )
    packed_ok = nck == 1 and jax.config.jax_enable_x64
    if impl == "packed" and not packed_ok:
        raise ValueError(
            "VKRS_MERGE_SEED_IMPL=packed packs a single 32-bit compare "
            "plane into a u64 comparator and needs jax_enable_x64 (under "
            "x64-off, lax truncates the u64 iota to u32 and the pack would "
            f"drop key bits); got nck={nck}, "
            f"x64={jax.config.jax_enable_x64} — use iota or stable"
        )
    if impl == "auto":
        impl = "iota"
    if impl == "packed":
        wlog = int(np.ceil(np.log2(rows2d[0].shape[1])))
        ri = jax.lax.broadcasted_iota(jnp.uint64, rows2d[0].shape, 1)
        kb = jax.lax.bitcast_convert_type(
            rows2d[0], jnp.uint32
        ) ^ np.uint32(0x80000000)
        k64 = jax.lax.convert_element_type(kb, jnp.uint64)
        p = jax.lax.shift_left(k64, jax.lax.full_like(k64, wlog)) | ri
        out = jax.lax.sort(
            (p,) + tuple(rows2d[1:]), dimension=1, num_keys=1, is_stable=False
        )
        kd = jax.lax.bitcast_convert_type(
            jax.lax.convert_element_type(
                jax.lax.shift_right_logical(
                    out[0], jax.lax.full_like(out[0], wlog)
                ),
                jnp.uint32,
            )
            ^ np.uint32(0x80000000),
            jnp.int32,
        )
        return (kd,) + out[1:]
    if impl == "iota":
        ri = jax.lax.broadcasted_iota(jnp.int32, rows2d[0].shape, 1)
        out = jax.lax.sort(
            tuple(rows2d[:nck]) + (ri,) + tuple(rows2d[nck:]),
            dimension=1, num_keys=nck + 1, is_stable=False,
        )
        return out[:nck] + out[nck + 1:]
    return jax.lax.sort(tuple(rows2d), dimension=1, num_keys=nck, is_stable=True)


def _segsort_seed(planes, nck, width=None, stable=False):
    """Seed the bitonic network's levels 1..width with ONE XLA batched
    segment sort: narrow rows sort at the chip's fastest measured regime
    (BENCHMARKS.md "primitive rates": 4981 M/s keys at width 2048, 3214 at
    16384, vs the 660-980 M/s mid-size regimes), then odd rows flip to
    restore the network's direction invariant (after level k completes,
    block q is ascending iff q is even), so the Pallas tile-sort continues
    from level 2*width — or is skipped entirely when width == T. Whether
    the XLA pass beats the in-kernel levels it replaces depends on the
    tilesort's compute/DMA split — decided by the committed session
    measurements (SEGSEED_TABLE), not assumed."""
    w = C if width is None else int(width)
    rows2d = [p.reshape(-1, w) for p in planes]
    # stable=True is the syn_tie mode's seed: equal keys keep row order, so
    # the odd-row flip leaves them exactly reverse-stable — the invariant
    # the synthetic tie-break plane reconstructs (sort_merge_planes)
    if stable:
        out = _stable_seed_sort(rows2d, nck)
    else:
        out = jax.lax.sort(tuple(rows2d), dimension=1, num_keys=nck, is_stable=False)
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows2d[0].shape[0], 1), 0)
    odd = (ri & 1) == 1
    return [jnp.where(odd, o[:, ::-1], o).reshape(-1) for o in out]


def _env_segseed(default):
    """Trace-time A/B override: VKRS_MERGE_SEGSEED=0/1 forces the seed
    off/on, and a wider power of two (e.g. 16384) selects that seed width
    (benchmarks/tpu_session_r3*.sh sweep it per process); unset, the
    caller's value — the dispatcher's measured per-(op, N) default
    (engine/config.SEGSEED_TABLE) or an explicit ``segseed=`` — stands."""
    import os

    v = os.environ.get("VKRS_MERGE_SEGSEED")
    if v is None:
        return default
    try:
        iv = int(v)
    except ValueError:
        raise ValueError(
            f"VKRS_MERGE_SEGSEED={v!r}: expected 0, 1, or a power-of-two "
            f"seed width >= {C}"
        ) from None
    if iv in (0, 1):
        return bool(iv)
    if iv < C or (iv & (iv - 1)) != 0:
        raise ValueError(
            f"VKRS_MERGE_SEGSEED={v!r}: seed width must be a power of two "
            f">= {C} (lane width)"
        )
    return iv


def _seed_width(segseed, T) -> int:
    """Validated seed width: segseed=True seeds at the lane width C; an int
    seeds wider — clamped to the tile (width T skips the Pallas tilesort
    entirely)."""
    w = C if segseed is True else min(int(segseed), T)
    if w < C or (w & (w - 1)) != 0:  # real check: asserts vanish under -O
        raise ValueError(
            f"segseed width must be a power of two >= {C}, got {segseed}"
        )
    return w


def _tilesort_call(
    planes, nplanes, nck, G, interpret, segseed=False, syn_tie=False,
    apply_seed=True,
):
    T = G * C
    tlog = int(np.log2(T))
    ntiles = planes[0].shape[0] // T
    bs = pl.BlockSpec((T,), lambda t: (t,))
    chunks = _tilesort_chunks(tlog)
    if segseed:
        w = _seed_width(segseed, T)
        if apply_seed:
            # apply_seed=False means the caller already seeded (the engine
            # hoists the XLA seed out of its Pallas x64-off tracing
            # context — sort_merge_planes) and this call only trims the
            # network levels the seed replaced
            planes = _segsort_seed(planes, nck, width=w, stable=syn_tie)
        wlog = int(np.log2(w))
        chunks = [
            (max(klo, wlog + 1), khi) for klo, khi in chunks if khi > wlog
        ]
    for klo, khi in chunks:
        call = pl.pallas_call(
            functools.partial(
                _tilesort_kernel, nplanes, nck, G, klo, khi, tlog, syn_tie
            ),
            grid=(ntiles,),
            in_specs=[bs] * nplanes,
            out_specs=[bs] * nplanes,
            out_shape=[
                jax.ShapeDtypeStruct(planes[0].shape, jnp.int32)
                for _ in range(nplanes)
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )
        planes = list(call(*planes))
    return planes


# ---------------------------------------------------------------------------
# merge-path level: XLA split points + streaming window-merge kernel


def _level_splits(planes, nck, L, T, npad, ntiles_total):
    """Per-output-tile merge-path metadata for the runs-of-L level.

    Returns (ntiles_total, 8) int32:
    [a_woff, s_a, a_rem, b_woff, s_b, b_rem, out_tile, out_dir].
    *_woff are row-aligned window offsets into the flat buffers, s_* the
    sub-row shifts. a_rem = valid A elements from the window start (tail
    beyond -> sentinel); b_rem = valid B elements at the window END — the B
    window reads the run's DESCENDING storage forward, which IS rev(B') of
    the merge-path window, so its sentinel mask covers the head. out_tile is
    the block index this grid step writes (mirrored within descending output
    runs), out_dir the final in-VMEM merge direction (1 asc / 0 desc).

    The binary search finds a = |A-part of the first dg merged elements| with
    A-priority on ties (stability): the predicate P(x) = A[x] <= B[dg-1-x] is
    monotone decreasing in x, and a = the first x where it fails.
    """
    t = jnp.arange(ntiles_total, dtype=jnp.int32)
    tstart = t * T
    p = tstart // (2 * L)
    dg = tstart - p * (2 * L)
    run_a = p * (2 * L)
    la = jnp.clip(npad - run_a, 0, L).astype(jnp.int32)
    lb = jnp.clip(npad - run_a - L, 0, L).astype(jnp.int32)
    lo = jnp.maximum(0, dg - lb)
    hi = jnp.minimum(dg, la)
    # L may be traced (the level loop runs as a fori_loop so the Pallas
    # kernel is compiled exactly once); use the static worst-case step count
    steps = int(np.ceil(np.log2(max(npad, 2)))) + 1

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        ai = run_a + mid
        # B_asc[i] lives at run_b_start + lb - 1 - i (descending storage)
        bi = run_a + L + lb - dg + mid
        av = [jnp.take(pln, ai, mode="clip") for pln in planes[:nck]]
        bv = [jnp.take(pln, bi, mode="clip") for pln in planes[:nck]]
        le = _lex_le_i(av, bv, nck) == 1
        active = lo < hi
        return (
            jnp.where(active & le, mid + 1, lo),
            jnp.where(active & ~le, mid, hi),
        )

    a, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    a = jnp.clip(a, 0, la)
    b = jnp.clip(dg - a, 0, lb)
    a_abs = jnp.minimum(run_a + a, npad)
    a_rem = jnp.clip(la - a, 0, T).astype(jnp.int32)
    b_rem = jnp.clip(lb - b, 0, T).astype(jnp.int32)
    # rev(B') window: the merge-path B window is B_asc[b : b+T]; in the
    # descending storage its reversal reads FORWARD from
    # run_b_start + (lb - b) - T, valid only in the last b_rem positions.
    b_abs = jnp.where(lb > 0, run_a + L + (lb - b) - T, npad)
    # pad tiles (tstart >= npad): point both windows at the sentinel tail
    is_pad = tstart >= npad
    a_abs = jnp.where(is_pad, npad, a_abs)
    b_abs = jnp.where(is_pad, npad, b_abs)
    a_rem = jnp.where(is_pad, 0, a_rem)
    b_rem = jnp.where(is_pad, 0, b_rem)
    # output placement: run p of the NEXT level is ascending when even,
    # descending (stored mirrored) when odd; pad tiles write in place
    out_dir = jnp.where(is_pad, 1, 1 - (p & 1))
    olen_tiles = (la + lb) // T  # la, lb are multiples of T
    out_mirror = run_a // T + olen_tiles - 1 - dg // T
    out_tile = jnp.where(out_dir == 1, t, out_mirror)
    a_woff = (a_abs // C) * C
    b_woff = (b_abs // C) * C
    return jnp.stack(
        [
            a_woff,
            a_abs - a_woff,
            a_rem,
            b_woff,
            b_abs - b_woff,
            b_rem,
            out_tile,
            out_dir,
        ],
        axis=1,
    )


def _align_window(w2d, s, G):
    """(G+1, C) raw window -> (G, C) view starting at flat element ``s``
    (traced, 0 <= s < C): two rolls + a lane select."""
    r1 = pltpu.roll(w2d, -s, 1)
    down = pltpu.roll(r1, G, 0)  # static positive: row i <- row i+1 (mod G+1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G + 1, C), 1)
    return jnp.where(lane < C - s, r1, down)[:G]


def _mergepath_kernel(nplanes, nck, G, ntiles, lookahead, syn_tie, meta_ref, *refs):
    """One output tile per grid step, with cross-step DMA lookahead: while
    step t's 18-stage in-VMEM merge runs, step t+1's two windows are already
    streaming into the other scratch slot (scratch persists across the
    sequential TPU grid), so the window fetch costs wall-clock only on the
    first tile. The analog in the reference is descriptor-set ping-pong
    across iterations (reference MultiRadixSort.cpp:34-46) — here the
    ping-pong is between VMEM scratch slots inside one kernel.

    ``lookahead=False`` (env VKRS_MERGE_LOOKAHEAD=0) restores the serial
    fetch-wait-compute schedule in slot 0 — the A/B baseline for measuring
    the overlap, and the fallback if the dynamic-slot DMA pattern ever
    regresses in Mosaic.

    The slot pair lives FLAT in one 1-D scratch of 2*(T+C) elements per
    window, addressed at ``slot*(T+C)``: a (2, T+C) buffer would carry
    (2,128) sublane tiling whose single-row slices Mosaic rejects (the
    round-3 real-chip compile failure; memory: axon-tpu-gotchas), while 1-D
    offsets only need 1024-divisibility — T+C is a multiple of 2048."""
    T = G * C
    W = T + C  # window length; the slot stride in the flat scratch

    ins = refs[:nplanes]
    outs = refs[nplanes : 2 * nplanes]
    scr_a = refs[2 * nplanes : 3 * nplanes]  # each (2*W,) flat slot pair
    scr_b = refs[3 * nplanes : 4 * nplanes]
    sem = refs[4 * nplanes]  # (2, 2*nplanes)
    t = pl.program_id(0)

    def slot_ds(slot):
        return pl.ds(pl.multiple_of(slot * np.int32(W), 1024), W)

    def window_copies(slot, tt):
        """The 2*nplanes window DMAs for tile ``tt`` into scratch ``slot``
        (same descriptors reconstruct for start and wait)."""
        cps = []
        for i in range(nplanes):
            cps.append(
                pltpu.make_async_copy(
                    ins[i].at[pl.ds(pl.multiple_of(meta_ref[tt, 0], 1024), W)],
                    scr_a[i].at[slot_ds(slot)],
                    sem.at[slot, np.int32(2 * i)],
                )
            )
            cps.append(
                pltpu.make_async_copy(
                    ins[i].at[pl.ds(pl.multiple_of(meta_ref[tt, 3], 1024), W)],
                    scr_b[i].at[slot_ds(slot)],
                    sem.at[slot, np.int32(2 * i + 1)],
                )
            )
        return cps

    if lookahead:
        slot = jax.lax.rem(t, np.int32(2))

        @pl.when(t == 0)
        def _first():
            for cp in window_copies(np.int32(0), t):
                cp.start()

        @pl.when(t + 1 < ntiles)
        def _lookahead():
            for cp in window_copies(np.int32(1) - slot, t + 1):
                cp.start()
    else:
        slot = np.int32(0)
        for cp in window_copies(slot, t):
            cp.start()

    for cp in window_copies(slot, t):
        cp.wait()

    s_a = meta_ref[t, 1]
    a_rem = meta_ref[t, 2]
    s_b = meta_ref[t, 4]
    b_rem = meta_ref[t, 5]
    out_dir = meta_ref[t, 7]
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (G, C), 0) * C
        + jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
    )
    a_planes = []
    b_planes = []
    for i in range(nplanes):
        sent = _SENT if i < nck else np.int32(0)
        wa = _align_window(scr_a[i][slot_ds(slot)].reshape(G + 1, C), s_a, G)
        a_planes.append(jnp.where(flat < a_rem, wa, sent).reshape(T))
        # the B window is rev(B') already (descending storage read forward);
        # its valid elements sit at the END, so the sentinel mask is a HEAD
        # mask — sentinels-then-descending keeps the half descending, so
        # A' ++ B-window stays bitonic with zero reversal stages.
        wb = _align_window(scr_b[i][slot_ds(slot)].reshape(G + 1, C), s_b, G)
        b_planes.append(jnp.where(flat >= T - b_rem, wb, sent).reshape(T))
    if syn_tie:
        # Synthetic tie-break plane, zero HBM traffic (sort_merge_planes):
        # run A is ascending storage with ties in stable order, so its
        # window position IS the tie rank; the B window is rev(B') — ties
        # ascend as flat DESCENDS — and every B tie ranks after every A tie
        # (A-priority, matching _level_splits' <= search). Invalid window
        # positions rank last, exactly like the key sentinels.
        syn_a = jnp.where(flat < a_rem, flat, _SENT).reshape(T)
        syn_b = jnp.where(
            flat >= T - b_rem, np.int32(2 * T - 1) - flat, _SENT
        ).reshape(T)
        a_planes = a_planes[:nck] + [syn_a] + a_planes[nck:]
        b_planes = b_planes[:nck] + [syn_b] + b_planes[nck:]
        nck += 1
    # bitonic lowest-half: lo = min(A', rev(B')) is the output tile's multiset
    le = _lex_le_i(a_planes, b_planes, nck) == 1
    lo = [jnp.where(le, a, b) for a, b in zip(a_planes, b_planes)]
    lo = _net_level(lo, nck, G, flat, T, final_dir=out_dir)
    if syn_tie:
        lo = lo[: nck - 1] + lo[nck:]
    for o, p in zip(outs, lo):
        o[:] = p


def _mergepath_call(planes, meta, nplanes, nck, G, interpret, syn_tie=False):
    import os

    T = G * C
    ntiles = planes[0].shape[0] // T
    # Read at TRACE time: flipping the env var after a jit cache entry
    # exists is silently ignored — A/B the two schedules from separate
    # processes (benchmarks/tpu_session_r3.sh step 8 does exactly that).
    lookahead = os.environ.get("VKRS_MERGE_LOOKAHEAD", "1") != "0"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * nplanes,
        # block index from the prefetched meta: descending output runs are
        # written mirrored (meta col 6), so placement follows the run's
        # storage direction with no extra pass
        out_specs=[pl.BlockSpec((T,), lambda t, meta: (meta[t, 6],))] * nplanes,
        # flat slot pair per window: slot s at offset s*(T+C) — a (2, T+C)
        # shape would carry (2,128) tiling whose 1-row slices Mosaic rejects
        scratch_shapes=[pltpu.VMEM((2 * (T + C),), jnp.int32)] * (2 * nplanes)
        + [pltpu.SemaphoreType.DMA((2, 2 * nplanes))],
    )
    call = pl.pallas_call(
        functools.partial(
            _mergepath_kernel, nplanes, nck, G, ntiles, lookahead, syn_tie
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(planes[0].shape, jnp.int32) for _ in range(nplanes)
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )
    return list(call(meta, *planes))


# ---------------------------------------------------------------------------
# driver


def grain_to_tile_rows(grain: int | None) -> int | None:
    """Convert a grain-table row (elements per tile — the NBPW-optima
    analog, engine/config.GRAIN_TABLE) to the engine's ``tile_rows``
    knob: VMEM rows of C elements, floored to a power of two >= 2 (the
    network and split arithmetic require power-of-two tiles)."""
    if grain is None:
        return None
    return 1 << max(int(grain // C).bit_length() - 1, 1)


def fits_envelope(n: int, tile_rows: int | None = None, nplanes: int = 1) -> bool:
    """True when ``sort_merge_planes``' int32 split arithmetic can host
    ``n`` elements at this grain (static, trace-time check — the routing
    layer consults it so implicit dispatch never selects a (n, tile)
    combination the engine would refuse)."""
    G = int(tile_rows) if tile_rows else _default_tile_rows(nplanes)
    T = G * C
    npad = round_up(max(n, T), T)
    return npad + 2 * T < (1 << 31) and 3 * npad < (1 << 31)


def sort_merge_planes(
    planes,
    nck: int,
    *,
    tile_rows: int = 128,
    interpret: bool = False,
    segseed: bool | int = False,
    syn_tie: bool = False,
):
    """Sort int32 planes lexicographically by the first ``nck`` planes.

    planes: list of 1-D int32 arrays (equal length n); compare planes first
    (signed-order space — see ops/segsort.to_signed_order), carry planes
    after. Returns same-length sorted planes. Requires n < 2^31.

    tile_rows (G) is the grain knob — elements per VMEM tile is G*2048, the
    analog of the reference's NUM_BLOCKS_PER_WORKGROUP*WORKGROUP_SIZE
    (reference MultiRadixSort.cpp:12-17).

    ``syn_tie=True`` makes the sort STABLE over the ``nck`` compare planes
    without carrying an original-position plane through HBM: the tie-break
    among equal keys is SYNTHESIZED in VMEM per kernel invocation. The
    invariant that makes this sound: every run the ladder produces stores
    equal keys in stable order (reverse-stable inside descending storage),
    and stable order is then recoverable from pure window geometry —
    position inside the tile (tilesort; XORed inside the network's
    descending blocks), window position for A / reversed window position
    offset by T for B (merge levels; _level_splits' ``<=`` search already
    consumes A first on ties). The synthetic plane joins every lex compare
    and compare-exchange but is dropped before each kernel writes — stable
    kv at the HBM cost of the unstable 2-plane sort (the position plane was
    ~1/3 of the stable composite's traffic at 1e8, BENCHMARKS.md).
    """
    G = int(tile_rows)
    assert G >= 2 and (G & (G - 1)) == 0, "tile_rows must be a power of two >= 2"
    T = G * C
    nplanes = len(planes)
    n = planes[0].shape[0]
    npad = round_up(max(n, T), T)
    buflen = npad + 2 * T
    # int32 split arithmetic: _level_splits intermediates reach
    # run_a + L + lb < 3*npad (run_a <= npad, L < npad at the last level),
    # so the real envelope is 3*npad < 2^31, not merely buflen < 2^31
    if buflen >= (1 << 31) or 3 * npad >= (1 << 31):
        raise NotImplementedError(
            "merge engine's int32 split arithmetic is bound to padded "
            f"size < 2^31/3 (~715M elements); got {npad}"
        )

    work = []
    for i, p in enumerate(planes):
        sent = _SENT if i < nck else np.int32(0)
        work.append(
            jnp.concatenate([p, jnp.full((buflen - n,), sent, jnp.int32)])
            if buflen != n
            else p
        )

    seg = _env_segseed(segseed)
    if seg:
        # the XLA seed runs OUTSIDE the x64-off Pallas tracing context
        # below: it is plain XLA (no Mosaic 4-byte constraint), and the
        # packed-u64 seed impl must see the caller's real x64 state
        # (_stable_seed_sort — under x64-off lax would truncate its u64s)
        work = _segsort_seed(
            work, nck, width=_seed_width(seg, T), stable=syn_tie
        )

    def run_kernels(work):
        work = _tilesort_call(
            work, nplanes, nck, G, interpret, segseed=seg, syn_tie=syn_tie,
            apply_seed=False,
        )
        ntiles_total = buflen // T
        nlev = max(int(np.ceil(np.log2(npad // T))), 0) if npad > T else 0

        def body(i, work_t):
            # run length at this level; < 2^31 by the buflen guard above
            L = jnp.int32(T) << i
            meta = _level_splits(list(work_t), nck, L, T, npad, ntiles_total)
            return tuple(
                _mergepath_call(
                    list(work_t), meta, nplanes, nck, G, interpret,
                    syn_tie=syn_tie,
                )
            )

        if nlev:
            # fori so the merge kernel is traced/compiled ONCE however many
            # run-doubling levels the size needs
            work = list(
                jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlev), body, tuple(work))
            )
        return work

    # all planes are 4-byte: trace Pallas under x64-off semantics (see
    # ops/bitonic.py — Python-int index math otherwise promotes through i64,
    # which Mosaic rejects)
    if jax.config.jax_enable_x64:
        from jax._src.config import enable_x64  # no public context manager

        with enable_x64(False):
            work = run_kernels(work)
    else:
        work = run_kernels(work)
    return [w[:n] for w in work]


# ---------------------------------------------------------------------------
# public engine entry: encoded keys (+ payload planes) -> sorted


_LOW32 = np.uint64(0xFFFFFFFF)


def _u32_signed(x32):
    """uint32 bit pattern -> order-isomorphic int32 plane."""
    return (x32 ^ np.uint32(0x80000000)).view(jnp.int32)


def _default_tile_rows(nplanes: int) -> int:
    # VMEM budget: the mergepath kernel holds 2*nplanes flat scratch window
    # buffers of 2*(T+C) i32 each (the slot PAIR for the cross-step DMA
    # lookahead lives flat in one 1-D buffer — _mergepath_kernel) plus
    # nplanes output blocks of T (double-buffered by the pipeline) —
    # ~24*nplanes*T bytes total. Keep that under the kernel's 100 MB
    # vmem_limit with headroom.
    # G=128 (T=256k) measured best for 1 plane on v5e; shrink with planes.
    g = 128
    while g > 8 and nplanes * g * C * 4 * 6 >= 96 * 2**20:
        g //= 2
    return g


def sort_merge(
    enc: jnp.ndarray,
    vals: tuple = (),
    *,
    stable: bool = True,
    tile_rows: int | None = None,
    interpret: bool = False,
    segseed: bool | int = False,
):
    """Merge-path engine on encoded (unsigned) keys with payload planes.

    The analog of the reference's flagship multi-workgroup pipeline
    (reference multiradixsort/resources/shaders/multi_radixsort.comp:45-126)
    re-designed for TPU: in-VMEM tile sorts + a run-doubling merge ladder of
    streaming one-pass kernels (module docstring). Accepts uint32/uint64
    encoded keys and any number of 4- or 8-byte payload arrays; returns
    ``(sorted_enc, sorted_vals_tuple)``.

    ``stable=True`` resolves ties to input order at the HBM cost of the
    UNSTABLE sort: the tie-break is the synthetic in-VMEM plane of
    :func:`sort_merge_planes` (``syn_tie``), not a carried position plane
    (``VKRS_MERGE_STABLE_POS=1`` restores the round-3 position-plane
    composite — the A/B baseline). Keys-only sorts never need either.
    """
    import os

    n = enc.shape[0]
    if n >= (1 << 31):
        raise NotImplementedError("merge engine is bound to n < 2^31")
    if enc.dtype == jnp.uint32:
        key_planes = [_u32_signed(enc)]
    elif enc.dtype == jnp.uint64:
        key_planes = [
            _u32_signed((enc >> np.uint64(32)).astype(jnp.uint32)),
            _u32_signed((enc & _LOW32).astype(jnp.uint32)),
        ]
    else:
        raise TypeError(f"merge engine sorts encoded u32/u64 keys, got {enc.dtype}")
    nck = len(key_planes)
    syn_tie = False
    if stable and vals:
        if os.environ.get("VKRS_MERGE_STABLE_POS") == "1":
            key_planes.append(jnp.arange(n, dtype=jnp.int32))
            nck += 1
        else:
            syn_tie = True
    carry = []
    carry_spec = []  # how to reassemble each payload: (dtype, nplanes)
    for v in vals:
        if v.dtype.itemsize == 8:
            b = v.view(jnp.uint64) if v.dtype != jnp.uint64 else v
            carry.append((b >> np.uint64(32)).astype(jnp.uint32).view(jnp.int32))
            carry.append((b & _LOW32).astype(jnp.uint32).view(jnp.int32))
            carry_spec.append((v.dtype, 2))
        elif v.dtype.itemsize == 4:
            carry.append(v.view(jnp.int32) if v.dtype != jnp.int32 else v)
            carry_spec.append((v.dtype, 1))
        else:
            raise TypeError(f"merge engine carries 4/8-byte payloads, got {v.dtype}")
    if tile_rows is None:
        tile_rows = _default_tile_rows(nck + len(carry))
    out = sort_merge_planes(
        key_planes + carry, nck, tile_rows=tile_rows, interpret=interpret,
        segseed=segseed, syn_tie=syn_tie,
    )
    if enc.dtype == jnp.uint32:
        out_enc = out[0].view(jnp.uint32) ^ np.uint32(0x80000000)
    else:
        hi = out[0].view(jnp.uint32) ^ np.uint32(0x80000000)
        lo = out[1].view(jnp.uint32) ^ np.uint32(0x80000000)
        out_enc = (hi.astype(jnp.uint64) << np.uint64(32)) | lo.astype(jnp.uint64)
    out_vals = []
    pos = nck
    for dtype, k in carry_spec:
        if k == 2:
            hi = out[pos].view(jnp.uint32).astype(jnp.uint64)
            lo = out[pos + 1].view(jnp.uint32).astype(jnp.uint64)
            out_vals.append(((hi << np.uint64(32)) | lo).view(dtype))
        else:
            out_vals.append(out[pos].view(dtype))
        pos += k
    return out_enc, tuple(out_vals)


def argsort_merge(
    enc: jnp.ndarray,
    *,
    tile_rows: int | None = None,
    interpret: bool = False,
    segseed: bool | int = False,
) -> jnp.ndarray:
    """Stable argsort on the merge engine: uint32 permutation for n < 2^31.

    One plane cheaper than ``sort_merge(enc, (positions,))``: the original-
    position compare plane that makes the bitonic network stable IS the
    answer, so the pipeline runs nck = key-planes + 1 total planes with no
    separate carry (cf. the packed-u64 argsort fast path on the tiled
    engine, dispatch.argsort).
    """
    n = enc.shape[0]
    if n >= (1 << 31):
        raise NotImplementedError("merge engine is bound to n < 2^31")
    if enc.dtype == jnp.uint32:
        key_planes = [_u32_signed(enc)]
    elif enc.dtype == jnp.uint64:
        key_planes = [
            _u32_signed((enc >> np.uint64(32)).astype(jnp.uint32)),
            _u32_signed((enc & _LOW32).astype(jnp.uint32)),
        ]
    else:
        raise TypeError(f"merge engine sorts encoded u32/u64 keys, got {enc.dtype}")
    planes = key_planes + [jnp.arange(n, dtype=jnp.int32)]
    if tile_rows is None:
        tile_rows = _default_tile_rows(len(planes))
    out = sort_merge_planes(
        planes, len(planes), tile_rows=tile_rows, interpret=interpret,
        segseed=segseed,
    )
    # positions are non-negative int32: the uint32 view is value-identical
    return out[-1].view(jnp.uint32)
