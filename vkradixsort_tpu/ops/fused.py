"""Fused in-VMEM radix sort — the single_radixsort analog (SURVEY.md §7 L1).

The reference's small-N path runs the ENTIRE 4-pass sort in one kernel launch
with one 256-thread workgroup (reference
singleradixsort/resources/shaders/single_radixsort.comp:42-137). This kernel
is the TPU-native equivalent: the whole (padded) array lives in VMEM and all
digit passes execute inside one ``pallas_call``. The reference's primitives
map as:

  shared-memory atomicAdd histogram (comp:56-61)   -> one-hot + reductions
  subgroup exclusive scans (comp:64-84)            -> masked lane-roll
                                                      doubling + triangular
                                                      matmuls on the MXU
  ballot/popcount stable rank (comp:87-128)        -> exclusive prefix of the
                                                      digit one-hot
  shared-buffer ping-pong scatter (comp:129-136)   -> factorized one-hot
                                                      matmul scatter (MXU)

Key TPU choices:
  * 4-bit sub-passes (16 bins) instead of 8-bit: rank needs an exclusive
    prefix of the digit one-hot over element order; 16 bins pack exactly
    into a (rows, 16*128) lane-major layout where the prefix is 7 masked
    lane rolls. 8 sub-passes for u32, 16 for u64.
  * No atomics, no scatter: the permutation is applied by matmul. With
    dest = q*128 + r, out[q, r] = sum_i [q_i == q][r_i == r] * v_i, i.e.
    two one-hot factors contracted on the MXU. Every output cell receives
    exactly one nonzero term, so fp32 accumulation is exact.
  * Keys/values are carried as 16-bit "planes" lifted to fp32 (u16 is
    exactly representable), so the matmul moves raw bits losslessly.

Stability: sub-pass ranks are exclusive prefix counts over the row-major
element order, so equal digits keep their relative order; LSD over stable
sub-passes is stable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkradixsort_tpu.engine.config import DEFAULT_CONFIG, SortConfig
from vkradixsort_tpu.ops.common import pad_to, round_up


def _dot(a, b, dims):
    # precision=HIGHEST is required for exactness: the default MXU path
    # truncates fp32 inputs to bf16 (8 mantissa bits), which corrupts
    # integer counts > 2^8 and u16 value planes.
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

LANES = 128
SUB_BITS = 4
SUB_BINS = 1 << SUB_BITS  # 16


def _compute_dest(d: jnp.ndarray) -> jnp.ndarray:
    """Per-element scatter destination for one 4-bit sub-pass.

    d: (R, 128) int32 digits in [0, 16). Returns (R, 128) float32 exact
    integer destinations (< R*128 <= 2^24, exact in fp32).
    """
    R = d.shape[0]
    W = SUB_BINS * LANES  # 2048

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    bin_of_lane = lane // LANES
    l_of_lane = lane % LANES

    # One-hot in "bin-major blocks of 128 lanes" layout:
    # oh[r, 128*b + l] = (digit[r, l] == b)
    dt = jnp.tile(d, (1, SUB_BINS))
    oh = (dt == bin_of_lane).astype(jnp.float32)

    # Within-row exclusive prefix per bin block (over lane order l):
    # 7 masked roll-doubling steps; the mask stops carries across blocks.
    incl = oh
    k = 1
    while k < LANES:
        sh = jnp.roll(incl, k, axis=1)
        incl = incl + jnp.where(l_of_lane >= k, sh, 0.0)
        k *= 2
    excl = incl - oh

    # Per-(row, bin) totals via a static selector matmul: SB[j, b] = (j//128 == b)
    jj = jax.lax.broadcasted_iota(jnp.int32, (W, SUB_BINS), 0)
    bb = jax.lax.broadcasted_iota(jnp.int32, (W, SUB_BINS), 1)
    SB = ((jj // LANES) == bb).astype(jnp.float32)
    tot = _dot(oh, SB, ((1,), (0,)))  # (R, 16)

    # Cross-row exclusive cumsum: strict lower-triangular matmul.
    r0 = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    Lr = (r1 < r0).astype(jnp.float32)
    crossrow = _dot(Lr, tot, ((1,), (0,)))  # (R, 16)

    # Global exclusive bin bases from column totals.
    total = jnp.sum(tot, axis=0, keepdims=True)  # (1, 16)
    b0 = jax.lax.broadcasted_iota(jnp.int32, (SUB_BINS, SUB_BINS), 0)
    b1 = jax.lax.broadcasted_iota(jnp.int32, (SUB_BINS, SUB_BINS), 1)
    Lb = (b0 < b1).astype(jnp.float32)
    gbase = _dot(total, Lb, ((1,), (0,)))  # (1, 16)

    # Broadcast (row, bin) fields back to the wide layout and select own bin.
    F16 = gbase + crossrow  # (R, 16)
    SBT = SB.T  # (16, W) selector transpose, static
    F = (
        _dot(F16, SBT, ((1,), (0,)))
        + excl
    )
    W_field = oh * F
    dest = jnp.zeros_like(d, dtype=jnp.float32)
    for b in range(SUB_BINS):
        dest = dest + W_field[:, b * LANES : (b + 1) * LANES]
    return dest


def _apply_permutation(dest_f32, planes, eb: int):
    """Scatter every plane to ``dest`` via factorized one-hot matmuls.

    dest_f32: (R, 128) exact-integer destinations (a permutation of 0..E-1).
    planes: (P, R, 128) float32 value planes (each entry < 2^16).
    eb: elements per matmul block (lane-contraction width).
    """
    P, R, _ = planes.shape
    E = R * LANES
    nb = E // eb

    destw = dest_f32.reshape(nb, eb).astype(jnp.int32)
    q = destw >> 7  # output row
    rl = destw & (LANES - 1)  # output lane
    planesw = planes.reshape(P, nb, eb)

    ciota = jax.lax.broadcasted_iota(jnp.int32, (R, eb), 0)
    riota = jax.lax.broadcasted_iota(jnp.int32, (LANES, eb), 0)

    outs = [jnp.zeros((R, LANES), jnp.float32) for _ in range(P)]
    for ib in range(nb):
        qb = jnp.broadcast_to(q[ib : ib + 1], (R, eb))
        AqT = (qb == ciota).astype(jnp.float32)  # (R, eb)
        rb = jnp.broadcast_to(rl[ib : ib + 1], (LANES, eb))
        sel = riota == rb  # (128, eb)
        for pi in range(P):
            vb = jnp.broadcast_to(planesw[pi, ib : ib + 1], (LANES, eb))
            M2 = jnp.where(sel, vb, 0.0)
            outs[pi] = outs[pi] + _dot(AqT, M2, ((1,), (1,)))
    return jnp.stack(outs)


def _make_kernel(num_key_planes: int, num_planes: int, eb: int):
    """Build the fused-sort kernel body.

    The digit loop is a ``fori_loop`` over the sub-passes (plane index and
    shift derived from the loop counter, the active key plane picked by
    dynamic index) so Mosaic compiles ONE sub-pass body instead of
    8 (u32) / 16 (u64) unrolled copies — this is what holds the kernel's
    compile time down.
    """

    def kernel(*refs):
        ins = refs[:num_planes]
        outs = refs[num_planes:]
        planes = jnp.stack([r[:] for r in ins])  # (P, R, 128)

        def sub_pass(sp, planes):
            kp = sp // 4
            s = sp - kp * 4
            # Mosaic has no dynamic_slice on in-kernel values; pick the
            # active key plane by a masked sum over the (tiny) leading axis
            # — exactly one term is nonzero, so the f32 sum is exact.
            mask = (
                jax.lax.broadcasted_iota(jnp.int32, (num_planes, 1, 1), 0) == kp
            ).astype(jnp.float32)
            bits = jnp.sum(planes * mask, axis=0).astype(jnp.int32)
            d = (bits >> (s * SUB_BITS)) & (SUB_BINS - 1)
            dest = _compute_dest(d)
            return _apply_permutation(dest, planes, eb)

        # int32 bounds: under jax_enable_x64 plain-int bounds would trace an
        # i64 loop counter, which Mosaic rejects (see axon-tpu gotchas).
        planes = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(num_key_planes * 4), sub_pass, planes
        )
        for i, o in enumerate(outs):
            o[:] = planes[i]

    return kernel


def _to_planes(arr_u: jnp.ndarray, R: int) -> list[jnp.ndarray]:
    """Split an unsigned array into fp32-exact u16 planes, low first."""
    nbytes = arr_u.dtype.itemsize
    planes = []
    for h in range(nbytes // 2):
        half = (arr_u >> np.asarray(16 * h, arr_u.dtype)) & np.asarray(0xFFFF, arr_u.dtype)
        planes.append(half.astype(jnp.float32).reshape(R, LANES))
    return planes


def _from_planes(planes: list[jnp.ndarray], dtype) -> jnp.ndarray:
    out = jnp.zeros(planes[0].shape, jnp.dtype(dtype)).reshape(-1)
    for h, p in enumerate(planes):
        out = out | (p.reshape(-1).astype(jnp.dtype(dtype)) << np.asarray(16 * h, dtype))
    return out


@functools.partial(jax.jit, static_argnames=("config", "has_values", "value_dtype"))
def _sort_fused_impl(enc, values_u, config: SortConfig, has_values: bool, value_dtype):
    n = enc.shape[0]
    # Floor the padded size at 8192: the degenerate single-block geometry
    # (e=4096, R=32, nb=1) sends Mosaic down a pathological compile path
    # (measured 8-21 MINUTES vs ~5 s for every nb>=2 shape on v5e); the
    # extra 4096 sentinel elements cost microseconds at runtime.
    e = round_up(max(n, 8192), 4096)
    eb = 4096  # block width; e >= 2*eb guarantees nb >= 2 (see floor above)
    R = e // LANES

    key_planes = _to_planes(pad_to(enc, e), R)
    planes = list(key_planes)
    if has_values:
        vpad = jnp.concatenate(
            [values_u, jnp.zeros((e - n,), values_u.dtype)]
        ) if e != n else values_u
        planes += _to_planes(vpad, R)

    kp = len(key_planes)
    num_planes = len(planes)
    kernel = _make_kernel(kp, num_planes, eb)
    out_shapes = [jax.ShapeDtypeStruct((R, LANES), jnp.float32)] * num_planes
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * num_planes,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * num_planes,
        # The one-hot working set (wide (R, 2048) prefix chains + permutation
        # factors) exceeds the default 16 MiB scoped-VMEM budget; v5e/v5p
        # have 128 MiB, so raise the Mosaic limit explicitly.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=config.interpret,
    )
    # Every pallas operand is an f32 u16-plane (even for u64 keys/values),
    # so tracing with x64 semantics off is always semantics-preserving here
    # — and required: the fori_loop counter math would otherwise promote
    # through i64, which Mosaic rejects / Pallas narrows via a trace-time
    # recursion (same pattern as ops/bitonic.py).
    from jax._src.config import enable_x64  # no public context manager

    with enable_x64(False):
        outs = call(*planes)

    out_keys = _from_planes(outs[:kp], enc.dtype)[:n]
    out_values = None
    if has_values:
        out_values = _from_planes(outs[kp:], value_dtype)[:n]
    return out_keys, out_values


def sort_fused(enc: jnp.ndarray, values, config: SortConfig = DEFAULT_CONFIG):
    """Sort encoded (unsigned) keys + optional values entirely in VMEM.

    Dispatch admits N <= config.fused_max_n to this engine (explicit
    ``backend="fused"`` only), the TPU analog of the reference's
    single-workgroup regime (README.md:18-21 recommends it below ~10k keys).
    """
    has_values = values is not None
    value_dtype = None
    values_u = None
    if has_values:
        if values.dtype.itemsize not in (4, 8):
            raise TypeError(f"values must be 4- or 8-byte typed, got {values.dtype}")
        udt = jnp.uint32 if values.dtype.itemsize == 4 else jnp.uint64
        values_u = values.view(udt) if values.dtype != udt else values
        value_dtype = str(udt.dtype if hasattr(udt, "dtype") else jnp.dtype(udt))
    out_keys, out_values_u = _sort_fused_impl(
        enc, values_u, config, has_values, value_dtype
    )
    if has_values:
        return out_keys, out_values_u.view(values.dtype)
    return out_keys, None
