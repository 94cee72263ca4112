"""Explicit multi-pass tiled radix pipeline — component parity with the
reference's two-kernel-per-pass design (SURVEY.md §2 rows 2-3, §7 L2).

Per 8-bit digit pass, mirroring multi_radixsort_histograms.comp +
multi_radixsort.comp:

  1. ``tile_histograms``   (Pallas, MXU outer-product histograms)
  2. ``exclusive_bin_offsets`` (log-depth scan over the [tiles, 256] table —
     deliberately NOT the reference's O(num_workgroups) serial per-bin loop,
     multi_radixsort.comp:56-63)
  3. ``_dest_kernel``      (Pallas): per-element global destination =
     global bin base + cross-tile offset + stable intra-tile rank, the
     TPU-native replacement for the subgroup-ballot ranking
     (multi_radixsort.comp:83-126)
  4. the physical move. TPU has no fast global scatter (measured ~150M
     elts/s via XLA scatter on v5e — see BENCHMARKS.md), so this step uses
     XLA scatter and the pipeline serves as the *structural* radix path;
     the dispatcher routes production sorts to ops/tiled.py and large-N
     custom-kernel sorts to ops/merge.py, both of which sidestep
     per-element scatter entirely.

Ping-pong: like the reference's descriptor-set swap per iteration
(MultiRadixSort.cpp:34-46), XLA double-buffers the pass outputs; with
donated inputs the buffers alternate in place.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkradixsort_tpu.ops.common import NUM_BINS, BITS_PER_PASS, num_passes, pad_to, round_up
from vkradixsort_tpu.ops.histogram import tile_histograms
from vkradixsort_tpu.ops.reference import exclusive_bin_offsets

LANES = 128


TILES_PER_STEP = 8  # Mosaic block shapes need the sublane dim divisible by 8


def _dest_one_tile(x, base_row, shift):
    """dest[i] = base[digit_i] + (# earlier elements in tile with same digit).

    x: (R, 128) tile of keys; base_row: (1, 256) global offsets for this tile.
    """
    R = x.shape[0]
    t = R * LANES
    digits = (x >> shift).astype(jnp.int32) & (NUM_BINS - 1)
    flat = digits.reshape(1, t)

    # One-hot transposed: bins on sublanes, elements on lanes.
    dd = jnp.broadcast_to(flat, (NUM_BINS, t))
    bins = jax.lax.broadcasted_iota(jnp.int32, (NUM_BINS, t), 0)
    oh = (dd == bins).astype(jnp.float32)

    # Intra-tile exclusive rank along the element (lane) axis per bin:
    # inclusive prefix via log-doubling lane shifts, then subtract self.
    incl = oh
    k = 1
    while k < t:
        # np.int32: a bare Python int shift traces as i64 under
        # jax_enable_x64, which tpu.dynamic_rotate rejects.
        sh = pltpu.roll(incl, np.int32(k), 1)
        li = jax.lax.broadcasted_iota(jnp.int32, (NUM_BINS, t), 1)
        incl = incl + jnp.where(li >= k, sh, 0.0)
        k *= 2
    excl = incl - oh  # (256, t)

    # (1, 256) -> (256, 1) without the (unsupported) narrow reshape: transpose
    # two 128-lane halves and stack along sublanes.
    base_col = jnp.concatenate(
        [base_row[:, :LANES].T, base_row[:, LANES:].T], axis=0
    )  # (256, 1)
    baseT = jnp.broadcast_to(base_col, (NUM_BINS, t)).astype(jnp.float32)
    field = oh * (baseT + excl)
    dest_flat = jnp.sum(field, axis=0, keepdims=True)  # (1, t)
    return dest_flat.reshape(R, LANES).astype(jnp.int32)


def _dest_kernel(shift: int, tile_rows: int, x_ref, base_ref, o_ref):
    for ti in range(TILES_PER_STEP):
        o_ref[ti * tile_rows : (ti + 1) * tile_rows] = _dest_one_tile(
            x_ref[ti * tile_rows : (ti + 1) * tile_rows],
            base_ref[ti : ti + 1],
            shift,
        )


@functools.partial(jax.jit, static_argnames=("shift", "tile", "interpret"))
def pass_destinations(
    enc: jnp.ndarray, shift: int, tile: int = 2048, interpret: bool = False
) -> jnp.ndarray:
    """Global scatter destination for every element for one digit pass."""
    n = enc.shape[0]
    step = tile * TILES_PER_STEP
    npad = round_up(max(n, step), step)
    encp = pad_to(enc, npad)
    hist = tile_histograms(encp, shift, tile, interpret)
    base = exclusive_bin_offsets(hist)  # (tiles, 256)
    kernel = functools.partial(_dest_kernel, shift, tile // LANES)
    grid_spec = pl.GridSpec(
        grid=(npad // step,),
        in_specs=[
            pl.BlockSpec((step // LANES, LANES), lambda i: (i, i - i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILES_PER_STEP, NUM_BINS), lambda i: (i, i - i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((step // LANES, LANES), lambda i: (i, i - i), memory_space=pltpu.VMEM),
    )
    dest = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(encp.reshape(npad // LANES, LANES), base)
    return dest.reshape(-1)[:n]


def radix_pass_tiled(enc, values, shift, tile=2048, interpret=False):
    """One full stable radix pass: Pallas destinations + XLA move."""
    dest = pass_destinations(enc, shift, tile, interpret)
    out_k = jnp.zeros_like(enc).at[dest].set(enc, mode="drop")
    out_v = None
    if values is not None:
        out_v = jnp.zeros_like(values).at[dest].set(values, mode="drop")
    return out_k, out_v


def sort_radix_tiled(enc, values=None, tile=2048, interpret=False):
    """Full LSD sort via the explicit tiled pipeline (parity path)."""
    for p in range(num_passes(enc.dtype)):
        enc, values = radix_pass_tiled(enc, values, p * BITS_PER_PASS, tile, interpret)
    return enc, values
