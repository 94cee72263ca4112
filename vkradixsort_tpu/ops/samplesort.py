"""Single-chip sample sort — the structural large-N pipeline.

This is the TPU-native re-architecture of the reference's multi-workgroup
regime (reference multiradixsort/resources/shaders/*.comp): the reference
tiles the array over workgroups, coordinates through a global histogram
table, and relies on cheap GPU global-memory scatter for the physical move
(multi_radixsort.comp:119). TPUs have no fast element-wise scatter (measured
~81 M elems/s for a random 1e8 gather — BENCHMARKS.md), but they do have
bulk DMA engines addressable at dynamic offsets from Pallas. So the
structure becomes a splitter-based sample sort where ALL element-level work
happens inside XLA's sort and the only global data movement is
contiguous-run DMA:

  1. tile the (padded) array into G rows of C elements; sort each row in its
     own XLA sort call (a ``lax.scan`` of flat sorts);
  2. sample splitters from the sorted rows (regular quantile positions — an
     oversampled global sample, the skew-handling knob);
  3. per (row, bucket): run boundaries via vectorized ``searchsorted``, with
     boundaries inside equal-key runs balanced toward the even-spread target
     (duplicate keys are interchangeable, so constant/Zipf inputs stay
     balanced — see ``_bucket_starts``);
  4. a Pallas kernel DMAs every (row, bucket) run HBM->HBM into its static
     slot in the bucket matrix (B, G, cap). TPU DMA offsets must be
     provably aligned to the (1024,) HBM tiling, so each copy starts at the
     run's start rounded DOWN to 1024 and carries up to 1024 leading
     neighbors; a single fused elementwise pass then masks everything
     outside each slot's valid window [pre, pre+len) to the sentinel;
  5. bucket b is sorted and compacted in one ``fori_loop`` step: slice its
     padded row, one flat XLA sort (sentinels sink to the tail), and an
     in-place ``dynamic_update_slice`` at the exact global offset
     exclusive-scanned from the run lengths. The tail garbage each step
     writes is overwritten by the next step's update (loop steps are
     sequential), so the prefix [0, n) ends up exact.

Bucket overflow (a run larger than ``cap`` after step 3's balancing — only
possible when the splitter sample badly mispredicts the distribution) is
detected and the whole sort falls back to one flat XLA sort via
``lax.cond``, so the result is always exact.

The keys-only path exploits duplicate-key interchangeability (equal-run
balancing, sentinel masking); the key-value path (`sort_pairs_samplesort`)
instead carries original positions as a composite sort key, which makes
every element distinct and the result stable. Requires padded size < 2^31
(int32 offset arithmetic; the multi-chip layer shards well before that).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkradixsort_tpu.ops import segsort
from vkradixsort_tpu.ops.common import (
    cdiv,
    composite_searchsorted,
    pad_sentinel,
    pad_to,
    round_up,
)

LANES = 128
ALIGN = 1024  # HBM 1-D memref tiling: DMA offsets/sizes must be multiples


# ---------------------------------------------------------------------------
# Pallas kernel: bulk run placement


def _placement_kernel(
    B: int, capw: int, row_ext: int, astarts_ref, rows_ref, out_ref, sem
):
    """Grid step g: DMA row g's B (aligned) bucket runs into their slots.

    astarts_ref: (G, B) int32 in SMEM — run starts rounded down to ALIGN.
    rows_ref:    flat (G * row_ext,) keys in HBM, rows sorted and
                 sentinel-extended; row_ext is a multiple of ALIGN.
    out_ref:     flat (B * G * capw,) keys in HBM; slot (b, g) occupies
                 [(b*G + g) * capw, +capw).
    All slot destinations are disjoint, so the B copies per step can be in
    flight together; each step waits for its own before finishing.
    """
    g = pl.program_id(0)
    dmas = []
    for b in range(B):
        src = pl.multiple_of(g * row_ext + astarts_ref[g, b], ALIGN)
        dma = pltpu.make_async_copy(
            rows_ref.at[pl.ds(src, capw)],
            out_ref.at[pl.ds((b * pl.num_programs(0) + g) * capw, capw)],
            # np.int32: a bare Python int index traces as i64 under
            # jax_enable_x64, which tpu.memref_slice rejects.
            sem.at[np.int32(b)],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


def _place_runs(rows_flat, astarts, G: int, B: int, capw: int, interpret: bool):
    """flat sorted rows + (G, B) aligned starts -> (B, G, capw) slot tensor."""
    if rows_flat.dtype.itemsize == 8:
        # XLA's X64-rewriting pass cannot pass u64 operands to custom calls
        # (pallas_call) on TPU; DMA moves bytes, so run the placement on a
        # u32 view with element offsets doubled (alignment is preserved:
        # 2 * k * ALIGN remains a multiple of ALIGN).
        out32 = _place_runs(
            rows_flat.view(jnp.uint32), astarts * 2, G, B, capw * 2, interpret
        )
        return out32.reshape(-1).view(rows_flat.dtype).reshape(B, G, capw)
    row_ext = rows_flat.shape[0] // G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((B,))],
    )
    out = pl.pallas_call(
        functools.partial(_placement_kernel, B, capw, row_ext),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G * capw,), rows_flat.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(astarts, rows_flat)
    return out.reshape(B, G, capw)


# ---------------------------------------------------------------------------
# Splitters and run boundaries


def _scan_sort_rows(rows):
    """Sort each row in its own flat XLA sort, via lax.scan."""
    s = segsort.to_signed_order(rows)

    def body(carry, row):
        return carry, jax.lax.sort(row, dimension=0)

    _, out = jax.lax.scan(body, jnp.int32(0), s)
    return segsort.from_signed_order(out, rows.dtype)


def _splitters(rows_sorted, B: int, oversample: int):
    """B-1 global splitters from per-row regular quantile samples."""
    G, C = rows_sorted.shape
    num_s = oversample * B
    pos = (jnp.arange(num_s, dtype=jnp.int32) * C) // num_s + C // (2 * num_s)
    samples = rows_sorted[:, pos].reshape(-1)  # (G * num_s,) static gather
    samples = segsort.from_signed_order(
        jax.lax.sort(segsort.to_signed_order(samples), dimension=0),
        rows_sorted.dtype,
    )
    step = samples.shape[0] // B
    return samples[step::step][: B - 1]  # (B-1,)


def _bucket_starts(rows_sorted, splitters, cap: int):
    """Per-(row, bucket) run starts, balanced inside equal-key runs.

    For each splitter the legal boundary range in a sorted row is
    [searchsorted_left, searchsorted_right] (anywhere inside the equal-key
    run — duplicates are interchangeable). The boundary is pulled toward the
    even-spread target b*C/B within that range, which keeps degenerate
    distributions (constant, heavy Zipf modes) perfectly balanced. Returns
    (starts (G, B) int32, lens (G, B) int32, overflow bool) where overflow
    flags any run larger than cap (sampling failure -> caller falls back).
    """
    G, C = rows_sorted.shape
    B = splitters.shape[0] + 1

    def row_bounds(row):
        lo = jnp.searchsorted(row, splitters, side="left").astype(jnp.int32)
        hi = jnp.searchsorted(row, splitters, side="right").astype(jnp.int32)
        return lo, hi

    lo, hi = jax.vmap(row_bounds)(rows_sorted)  # (G, B-1) each
    target = ((jnp.arange(1, B, dtype=jnp.int32) * C) // B)[None, :]
    bounds = jnp.clip(target, lo, hi)  # monotone in b: max/min of monotone
    zeros = jnp.zeros((G, 1), jnp.int32)
    starts = jnp.concatenate([zeros, bounds], axis=1)  # (G, B)
    ends = jnp.concatenate([bounds, jnp.full((G, 1), C, jnp.int32)], axis=1)
    lens = ends - starts
    overflow = jnp.any(lens > cap)
    return starts, lens, overflow


# ---------------------------------------------------------------------------
# The pipeline


def _pick_geometry(n: int, tile_target: int, bucket_target: int, slack: float):
    """Static (G, C, B, cap) for a given input size."""
    G = max(cdiv(n, tile_target), 1)
    C = round_up(cdiv(n, G), LANES)
    B = int(np.clip(cdiv(G * C, bucket_target), 8, 128))
    cap = round_up(int(slack * C / B) + LANES, LANES)
    cap = min(cap, C)
    return G, C, B, cap


def sort_samplesort(
    enc: jnp.ndarray,
    *,
    tile_target: int = 1 << 19,
    bucket_target: int = 1 << 19,
    oversample: int = 32,
    slack: float = 1.35,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sort encoded (unsigned) keys; returns sorted keys of the same length.

    Keys-only (duplicates interchangeable); key-value pairs go through
    :func:`sort_pairs_samplesort`, which carries positions for stability.

    ``tile_target``/``bucket_target`` are the grain knob — the analog of
    the reference's NUM_BLOCKS_PER_WORKGROUP (reference README.md:253-264).
    Defaults follow the measured sweep at 1e8 on v5e
    (benchmarks/results/v5e_samplesort_grain_1e8.csv: 2^19 -> 491.5 ms vs
    2^21 -> 521.1 ms; benchmarks/grain_sweep.py re-measures).
    """
    n = enc.shape[0]
    if n == 0:
        return enc
    G, C, B, cap = _pick_geometry(n, tile_target, bucket_target, slack)
    capw = round_up(cap + ALIGN, ALIGN)  # slot width incl. alignment slop
    row_ext = round_up(C + capw, ALIGN)
    npad = G * C
    # The PADDED size is what the int32 offset arithmetic (obase cumsum,
    # dynamic_update_slice offsets) must represent, not just n.
    if npad >= (1 << 31):
        raise NotImplementedError("samplesort needs padded size < 2^31 (int32 offsets)")
    W = G * capw
    sentinel = pad_sentinel(enc.dtype)

    rows = pad_to(enc, npad).reshape(G, C)
    rows_sorted = _scan_sort_rows(rows)
    splitters = _splitters(rows_sorted, B, oversample)
    starts, lens, overflow = _bucket_starts(rows_sorted, splitters, cap)

    def fallback(_):
        s = segsort.to_signed_order(enc)
        return segsort.from_signed_order(jax.lax.sort(s, dimension=0), enc.dtype)

    def pipeline(args):
        rows_sorted, starts, lens = args
        rows_flat = jnp.pad(
            rows_sorted, ((0, 0), (0, row_ext - C)), constant_values=sentinel
        ).reshape(-1)
        astarts = (starts // ALIGN) * ALIGN
        pre = starts - astarts  # (G, B) in [0, ALIGN)

        slots = _place_runs(rows_flat, astarts, G, B, capw, interpret)

        # Mask everything outside each slot's valid window to the sentinel.
        j = jax.lax.broadcasted_iota(jnp.int32, (B, G, capw), 2)
        preT = pre.T[:, :, None]  # (B, G, 1)
        lensT = lens.T[:, :, None]
        valid = (j >= preT) & (j < preT + lensT)
        slots = jnp.where(valid, slots, sentinel).reshape(B, W)

        # Per-bucket flat sort + in-place compaction at the exact offset.
        L = jnp.sum(lens, axis=0).astype(jnp.int32)  # (B,) valid lengths
        obase = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(L)[:-1].astype(jnp.int32)]
        )
        slots_signed = segsort.to_signed_order(slots)

        def body(b, out):
            row = jax.lax.dynamic_slice(slots_signed, (b, 0), (1, W))[0]
            row = jax.lax.sort(row, dimension=0)
            return jax.lax.dynamic_update_slice(out, row, (obase[b],))

        out0 = jnp.zeros((npad + W,), slots_signed.dtype)
        out = jax.lax.fori_loop(0, B, body, out0)
        return segsort.from_signed_order(out[:n], enc.dtype)

    return jax.lax.cond(
        overflow,
        lambda args: fallback(args[0]),
        pipeline,
        (rows_sorted, starts, lens),
    )


_GMAX = np.int32(np.iinfo(np.int32).max)


def sort_pairs_samplesort(
    enc: jnp.ndarray,
    values: jnp.ndarray,
    *,
    # kv keeps 2^21 (NOT the keys-only 2^19 optimum): the 3-plane DMA
    # placement is descriptor-bound, and smaller tiles mean more runs —
    # measured 817.6 ms at 2^19 vs 787 ms at 2^21 for 1e8 pairs on v5e.
    tile_target: int = 1 << 21,
    bucket_target: int = 1 << 21,
    oversample: int = 32,
    slack: float = 1.35,
    interpret: bool = False,
    _debug_overflow: bool = False,
):
    """Stable key-value sample sort of encoded (unsigned) keys.

    Same pipeline as :func:`sort_samplesort` but every element carries its
    original position ``gidx`` through the stages (the stability mechanism,
    mirroring parallel/distributed.py):

      * rows sort lexicographically by (key, gidx) with the payload as a
        third operand — composites are DISTINCT, so splitter boundaries need
        no equal-run balancing and a composite bisection finds them exactly;
      * placement DMAs all three planes with the same run starts;
      * masking sets keys to the sentinel AND gidx to INT32_MAX outside each
        slot's valid window, so garbage sorts strictly after every real pair
        even when real keys equal the key sentinel;
      * bucket sort is (key, gidx)-lexicographic; the valid prefix is exact.

    Rows are assigned by STRIDED interleave (element i -> row i % G), not
    contiguous chunks: the composite orders ties by original position, so a
    heavily repeated key would otherwise fill whole contiguous rows and
    overflow any sub-row bucket cap deterministically (the on-chip analog of
    parallel/distributed.py's block-interleave reshard). With interleaving,
    every row holds an even share of each tie run. Stability is untouched —
    it rides the explicit gidx, not the layout.
    """
    n = enc.shape[0]
    if n == 0:
        return enc, values
    if values.dtype.itemsize < 4:
        raise TypeError(
            f"samplesort values must be 4- or 8-byte typed (DMA tiling), "
            f"got {values.dtype}; widen the payload (e.g. to float32/int32)"
        )
    if values.dtype == jnp.float64 and jax.default_backend() == "tpu":
        raise TypeError(
            "float64 values are not supported on TPU (f64 bitcasts are "
            "unimplemented by the X64 rewriter); use int64 bit patterns"
        )
    G, C, B, cap = _pick_geometry(n, tile_target, bucket_target, slack)
    capw = round_up(cap + ALIGN, ALIGN)
    row_ext = round_up(C + capw, ALIGN)
    npad = G * C
    if npad >= (1 << 31):
        raise NotImplementedError("samplesort needs padded size < 2^31 (int32 offsets)")
    W = G * capw
    sentinel = pad_sentinel(enc.dtype)

    def interleave(flat):
        # element i -> (row i % G, col i // G); padded tail spreads too
        return flat.reshape(C, G).T

    gidx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    keys_p = interleave(pad_to(enc, npad))
    gidx_p = interleave(
        jnp.concatenate([gidx, jnp.full((npad - n,), _GMAX, jnp.int32)])
        if npad != n
        else gidx
    )
    vals_p = interleave(
        jnp.concatenate([values, jnp.zeros((npad - n,), values.dtype)])
        if npad != n
        else values
    )

    def rowsort(carry, row):
        rk, rg, rv = row
        out = jax.lax.sort(
            (segsort.to_signed_order(rk), rg, rv), dimension=0, num_keys=2
        )
        return carry, (segsort.from_signed_order(out[0], enc.dtype), out[1], out[2])

    _, (k_rows, g_rows, v_rows) = jax.lax.scan(
        rowsort, jnp.int32(0), (keys_p, gidx_p, vals_p)
    )

    # Composite splitters from regular quantile samples.
    num_s = oversample * B
    pos = (jnp.arange(num_s, dtype=jnp.int32) * C) // num_s + C // (2 * num_s)
    sk = k_rows[:, pos].reshape(-1)
    sg = g_rows[:, pos].reshape(-1)
    s_sorted = jax.lax.sort(
        (segsort.to_signed_order(sk), sg), dimension=0, num_keys=2
    )
    step = sk.shape[0] // B
    spl_k = segsort.from_signed_order(s_sorted[0], enc.dtype)[step::step][: B - 1]
    spl_g = s_sorted[1][step::step][: B - 1]

    bounds = jax.vmap(
        lambda rk, rg: composite_searchsorted(rk, rg, spl_k, spl_g)
    )(k_rows, g_rows)  # (G, B-1)
    zeros = jnp.zeros((G, 1), jnp.int32)
    starts = jnp.concatenate([zeros, bounds], axis=1)
    ends = jnp.concatenate([bounds, jnp.full((G, 1), C, jnp.int32)], axis=1)
    lens = ends - starts
    overflow = jnp.any(lens > cap)

    def fallback(args):
        k_rows, g_rows, v_rows, _, _ = args
        if enc.dtype == jnp.uint32:
            out_k, (out_v,) = segsort.sort_flat_u32(enc, (values,), stable=True)
        else:
            out_k, (out_v,) = segsort.sort_flat_u64(enc, (values,), stable=True)
        return out_k, out_v

    def pipeline(args):
        k_rows, g_rows, v_rows, starts, lens = args
        astarts = (starts // ALIGN) * ALIGN
        pre = starts - astarts

        def place(rows2d, fill):
            flat = jnp.pad(
                rows2d, ((0, 0), (0, row_ext - C)), constant_values=fill
            ).reshape(-1)
            return _place_runs(flat, astarts, G, B, capw, interpret)

        slots_k = place(k_rows, sentinel)
        slots_g = place(g_rows, _GMAX)
        slots_v = place(v_rows, 0)

        j = jax.lax.broadcasted_iota(jnp.int32, (B, G, capw), 2)
        preT = pre.T[:, :, None]
        lensT = lens.T[:, :, None]
        valid = (j >= preT) & (j < preT + lensT)
        slots_k = jnp.where(valid, slots_k, sentinel).reshape(B, W)
        slots_g = jnp.where(valid, slots_g, _GMAX).reshape(B, W)
        slots_v = slots_v.reshape(B, W)  # garbage values sort past L[b]

        L = jnp.sum(lens, axis=0).astype(jnp.int32)
        obase = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(L)[:-1].astype(jnp.int32)]
        )
        slots_ks = segsort.to_signed_order(slots_k)

        def body(b, outs):
            out_k, out_v = outs
            rk = jax.lax.dynamic_slice(slots_ks, (b, 0), (1, W))[0]
            rg = jax.lax.dynamic_slice(slots_g, (b, 0), (1, W))[0]
            rv = jax.lax.dynamic_slice(slots_v, (b, 0), (1, W))[0]
            srt = jax.lax.sort((rk, rg, rv), dimension=0, num_keys=2)
            out_k = jax.lax.dynamic_update_slice(out_k, srt[0], (obase[b],))
            out_v = jax.lax.dynamic_update_slice(out_v, srt[2], (obase[b],))
            return (out_k, out_v)

        out_k0 = jnp.zeros((npad + W,), slots_ks.dtype)
        out_v0 = jnp.zeros((npad + W,), values.dtype)
        out_k, out_v = jax.lax.fori_loop(0, B, body, (out_k0, out_v0))
        return segsort.from_signed_order(out_k[:n], enc.dtype), out_v[:n]

    out = jax.lax.cond(
        overflow, fallback, pipeline, (k_rows, g_rows, v_rows, starts, lens)
    )
    if _debug_overflow:  # test hook: expose whether the fallback fired
        return out + (overflow,)
    return out
