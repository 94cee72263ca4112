"""Per-tile 256-bin digit histogram kernel (Pallas).

TPU-native analog of ``multi_radixsort_histograms.comp`` (reference
multiradixsort/resources/shaders/multi_radixsort_histograms.comp:31-56):
the reference builds one shared-memory histogram per workgroup with
``atomicAdd`` and writes it to ``g_histograms[256 * wID + bin]``. TPU has no
atomics, so the histogram becomes an outer-product matmul of half-digit
one-hots: with hi = digit >> 4 and lo = digit & 15,

    hist[hi, lo] = sum_i onehot16(hi_i)[hi] * onehot16(lo_i)[lo]

i.e. one (16, T) x (T, 16) contraction on the MXU per tile. One-hot inputs
are 0/1 so default (bf16-multiplicand) MXU precision is exact; the fp32
accumulator is exact for counts < 2^24.

Output layout matches the reference's tile-major table: [num_tiles, 256]
with hist[t, b] the count of digit b in tile t.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkradixsort_tpu.ops.common import NUM_BINS, round_up

LANES = 128


TILES_PER_STEP = 8  # Mosaic block shapes need the sublane dim divisible by 8


def _hist_one_tile(x, shift):
    """(R, 128) tile -> (1, 256) histogram row via the outer-product matmul."""
    t = x.shape[0] * LANES
    digits = (x >> shift).astype(jnp.int32) & (NUM_BINS - 1)
    flat = digits.reshape(1, t)  # lane-major flatten (supported widening)
    hi = jnp.broadcast_to(flat >> 4, (16, t))
    lo = jnp.broadcast_to(flat & 15, (16, t))
    bins16 = jax.lax.broadcasted_iota(jnp.int32, (16, t), 0)
    a = (hi == bins16).astype(jnp.float32)  # (16, T) one-hot of hi, transposed
    b = (lo == bins16).astype(jnp.float32)
    hist = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (16, 16): hist[hi, lo]
    return hist.astype(jnp.int32)


def _hist_kernel(shift: int, tile_rows: int, x_ref, o_ref):
    # Output is (TILES_PER_STEP, 16, 16); Mosaic cannot reshape/concat the
    # narrow (16,16) result into a (1,256) row, so the flatten to
    # [tiles, 256] happens host-side.
    for t in range(TILES_PER_STEP):
        o_ref[t] = _hist_one_tile(x_ref[t * tile_rows : (t + 1) * tile_rows], shift)


@functools.partial(jax.jit, static_argnames=("shift", "tile", "interpret"))
def tile_histograms(
    enc: jnp.ndarray, shift: int, tile: int = 2048, interpret: bool = False
) -> jnp.ndarray:
    """[num_tiles, 256] digit counts of ``(enc >> shift) & 0xFF``.

    ``enc`` is padded with dtype-max sentinels to a tile multiple; the
    sentinel counts land in bin 255 of the last tiles and are the caller's
    responsibility (subtract or slice), matching how the reference guards
    with ``if (ID < g_num_elements)`` (multi_radixsort_histograms.comp:45).
    """
    n = enc.shape[0]
    step = tile * TILES_PER_STEP
    npad = round_up(max(n, step), step)
    if npad != n:
        from vkradixsort_tpu.ops.common import pad_to

        enc = pad_to(enc, npad)
    num_tiles = npad // tile
    kernel = functools.partial(_hist_kernel, shift, tile // LANES)
    # Index maps derive their zeros from the grid index (i - i) so they stay
    # int32 under jax_enable_x64; literal 0 traces as i64 there and Mosaic
    # fails to legalize the index-map return.
    grid_spec = pl.GridSpec(
        grid=(num_tiles // TILES_PER_STEP,),
        in_specs=[
            pl.BlockSpec(
                (step // LANES, LANES),
                lambda i: (i, i - i),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (TILES_PER_STEP, 16, 16), lambda i: (i, i - i, i - i), memory_space=pltpu.VMEM
        ),
    )
    out3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 16, 16), jnp.int32),
        interpret=interpret,
    )(enc.reshape(npad // LANES, LANES))
    return out3.reshape(num_tiles, NUM_BINS)
