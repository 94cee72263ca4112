"""In-VMEM vectorized bitonic sorting network (Pallas).

The TPU analog of the reference's within-workgroup sorting machinery: where
single_radixsort.comp coordinates 256 threads through shared memory with
barriers (reference singleradixsort/resources/shaders/single_radixsort.comp:
87-137), this kernel sorts a whole VMEM-resident block with a Batcher bitonic
network expressed as full-array vector ops: the compare-exchange partner
(i XOR j) is fetched with two ``pltpu.roll`` shifts (rows for j >= 128, lanes
for j < 128) and a select, so every stage is a handful of VPU ops over the
(rows, 128) block. Runs as two nested ``fori_loop``s (O(log^2 n) stages,
traced once — compile time stays flat in n).

Used where ``jax.lax.sort`` cannot go: inside larger Pallas kernels (the
distributed shuffle path) and as the self-contained network-sorter component.
For host-level block sorts, ``jax.lax.sort`` on segments is faster and the
dispatcher prefers it (see ops/segsort.py).

Stability: the network itself is unstable; for stable key-value sorting pass
``stable=True`` which carries an index array and breaks key ties by index
(lexicographic compare), making the result order deterministic and stable.
Sort order: ascending on the key dtype's natural order (use int32-encoded
keys from ``common.encode_keys`` + sign flip, or any signed/unsigned ints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LANES = 128


def _partner(arr, flat, j, jr, is_row):
    """Value of ``arr`` at index (i XOR j) for every element i."""
    ar = pltpu.roll(arr, -jr, 0)
    arb = pltpu.roll(arr, jr, 0)
    al = pltpu.roll(arr, -j, 1)
    alb = pltpu.roll(arr, j, 1)
    lower = (flat & j) == 0
    pr = jnp.where(lower, ar, arb)
    plv = jnp.where(lower, al, alb)
    return jnp.where(is_row, pr, plv)


def bitonic_stages(key, vals, flat, j, k, idx=None):
    """One compare-exchange stage at distance j within direction blocks k.

    key: primary sort key (int dtype). vals: arrays permuted alongside.
    idx: optional tiebreak array (stable ordering). All (R, 128).
    """
    jr = j // LANES
    is_row = j >= LANES
    pkey = _partner(key, flat, j, jr, is_row)
    # Integer masks only: Mosaic rejects bool-bool xor/not (i8->i1 trunc).
    lower_i = jnp.where((flat & j) == 0, 1, 0)
    up_i = jnp.where((flat & k) == 0, 1, 0)
    want_lo = lower_i == up_i
    if idx is not None:
        pidx = _partner(idx, flat, j, jr, is_row)
        pgt_i = jnp.where(pkey > key, 1, 0) + jnp.where(pkey == key, 1, 0) * jnp.where(
            pidx > idx, 1, 0
        )
        plt_i = jnp.where(pkey < key, 1, 0) + jnp.where(pkey == key, 1, 0) * jnp.where(
            pidx < idx, 1, 0
        )
    else:
        pidx = None
        pgt_i = jnp.where(pkey > key, 1, 0)
        plt_i = jnp.where(pkey < key, 1, 0)
    take_i = jnp.where(want_lo, plt_i, pgt_i)
    take = take_i == 1
    nkey = jnp.where(take, pkey, key)
    nidx = None if idx is None else jnp.where(take, pidx, idx)
    nvals = [jnp.where(take, _partner(v, flat, j, jr, is_row), v) for v in vals]
    return nkey, nidx, nvals


def _bitonic_body(nlog: int, key, vals, flat, idx=None):
    """Full bitonic network over (R, 128) arrays; returns sorted arrays."""

    def outer(kk, carry):
        key, idx_, vals = carry
        k = jnp.int32(2) << kk

        def inner(t, carry2):
            key2, idx2, vals2 = carry2
            j = (jnp.int32(1) << (kk - t)).astype(jnp.int32)
            return bitonic_stages(key2, vals2, flat, j, k, idx2)

        key, idx_, vals = jax.lax.fori_loop(
            jnp.int32(0), kk + jnp.int32(1), inner, (key, idx_, vals)
        )
        return key, idx_, vals

    # int32 loop bounds: under jax_enable_x64 Python-int bounds make the
    # loop index i64, which Mosaic rejects and whose narrowing conversion
    # hits a trace-time recursion inside Pallas kernels.
    key, idx, vals = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(nlog), outer, (key, idx, vals)
    )
    return key, idx, vals


def _make_kernel(nlog: int, nv: int, stable: bool):
    def kernel(*refs):
        nin = 1 + nv + (1 if stable else 0)
        x_ref = refs[0]
        vrefs = refs[1 : 1 + nv]
        idx_ref = refs[1 + nv] if stable else None
        outs = refs[nin:]
        R = x_ref.shape[0]
        ri = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        flat = ri * LANES + li
        key = x_ref[:]
        vals = [v[:] for v in vrefs]
        idx = idx_ref[:] if stable else None
        key, idx, vals = _bitonic_body(nlog, key, vals, flat, idx)
        outs[0][:] = key
        for o, v in zip(outs[1:], vals):
            o[:] = v

    return kernel


def bitonic_sort_block(
    keys: jnp.ndarray,
    values: tuple = (),
    stable: bool = False,
    interpret: bool = False,
):
    """Sort a 1-D array (padded to a power of two with dtype-max sentinels)
    entirely in VMEM; returns (sorted_keys, sorted_values_tuple).

    ``keys`` must be an integer dtype whose natural order is the sort order.

    With ``values``, the sort is always index-tiebroken (``stable`` is
    implied): the padding sentinel is the key dtype's max, so a real max-key
    pair would otherwise be interchangeable with padding in the key-only
    network and could surrender its payload slot to a padding zero.
    """
    if values:
        stable = True
    n = keys.shape[0]
    npad = 1 << max(int(np.ceil(np.log2(max(n, LANES * 8)))), 0)
    nlog = int(np.log2(npad))
    R = npad // LANES
    sentinel = np.iinfo(np.dtype(keys.dtype)).max
    kp = jnp.concatenate([keys, jnp.full((npad - n,), sentinel, keys.dtype)]) if npad != n else keys
    vps = [
        jnp.concatenate([v, jnp.zeros((npad - n,), v.dtype)]) if npad != n else v
        for v in values
    ]
    args = [kp.reshape(R, LANES)] + [v.reshape(R, LANES) for v in vps]
    if stable:
        idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES + (
            jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        )
        args.append(idx)
    kernel = _make_kernel(nlog, len(values), stable)
    out_shapes = [jax.ShapeDtypeStruct((R, LANES), keys.dtype)] + [
        jax.ShapeDtypeStruct((R, LANES), v.dtype) for v in values
    ]
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )
    if all(a.dtype.itemsize <= 4 for a in args):
        # Trace the kernel with x64 semantics off: under jax_enable_x64,
        # Python-int operands in the network's index math promote through
        # i64, which Mosaic rejects and whose narrowing conversion hits a
        # trace-time recursion inside Pallas. All arrays here are 32-bit,
        # so x64-off tracing is semantics-preserving.
        from jax._src.config import enable_x64  # no public context manager

        with enable_x64(False):
            outs = call(*args)
    else:
        # 8-byte keys/values: x64 tracing required; works in interpret/CPU.
        # On real TPU the X64 rewriter cannot pass 64-bit operands to
        # custom calls, so fail loudly rather than opaquely.
        if not interpret and jax.default_backend() == "tpu":
            raise NotImplementedError(
                "bitonic engine is limited to 4-byte keys/values on TPU "
                "(64-bit pallas operands unsupported); use backend='tiled'"
            )
        outs = call(*args)
    out_k = outs[0].reshape(-1)[:n]
    out_v = tuple(o.reshape(-1)[:n] for o in outs[1:])
    return out_k, out_v
