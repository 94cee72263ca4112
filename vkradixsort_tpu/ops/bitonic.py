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

Keys are compared as a LEXICOGRAPHIC tuple of int32 planes. 64-bit keys
split into (hi, lo) order-isomorphic planes — the same one-knob widening the
reference gets from ITERATIONS=8 (single_radixsort.comp:14,
SingleRadixSort.h:10-18) — which keeps every Pallas operand 4-byte, the form
Mosaic requires on TPU (the X64 rewriter cannot pass 64-bit operands to
custom calls). 8-byte payloads ride as two carried planes and are
reassembled after.

This is the self-contained network-sorter component, usable where
``jax.lax.sort`` cannot go (inside larger Pallas kernels); ops/merge.py
embeds the same network family in its tilesort/merge kernels. For
host-level block sorts, ``jax.lax.sort`` on segments is faster and the
dispatcher prefers it (see ops/segsort.py).

Stability: the network itself is unstable; for stable key-value sorting pass
``stable=True``, which appends the element's padded position as the last
compare plane — key ties then resolve to input order deterministically.
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


def _lex_lt_gt_i(aps, bps):
    """(a < b, a > b) lexicographic masks in ONE pass (int masks: Mosaic
    rejects bool<->bool not/xor), planes most-significant first. The stage
    needs both directions; sharing the per-plane compares (equality derived
    as 1 - lt - gt) halves the comparator cost for multi-plane sorts."""
    lt = jnp.where(aps[-1] < bps[-1], 1, 0)
    gt = jnp.where(bps[-1] < aps[-1], 1, 0)
    for a, b in zip(reversed(aps[:-1]), reversed(bps[:-1])):
        l_k = jnp.where(a < b, 1, 0)
        g_k = jnp.where(b < a, 1, 0)
        e_k = 1 - l_k - g_k
        lt = l_k + e_k * lt
        gt = g_k + e_k * gt
    return lt, gt


def bitonic_stages(keyps, vals, flat, j, k):
    """One compare-exchange stage at distance j within direction blocks k.

    keyps: tuple of sort-key planes, compared lexicographically (the last
    may be a position plane for stability). vals: tuple of arrays permuted
    alongside. All (R, 128).
    """
    jr = j // LANES
    is_row = j >= LANES
    pkeyps = tuple(_partner(p, flat, j, jr, is_row) for p in keyps)
    lower_i = jnp.where((flat & j) == 0, 1, 0)
    up_i = jnp.where((flat & k) == 0, 1, 0)
    want_lo = lower_i == up_i
    plt_i, pgt_i = _lex_lt_gt_i(pkeyps, keyps)
    take_i = jnp.where(want_lo, plt_i, pgt_i)
    take = take_i == 1
    nkeyps = tuple(jnp.where(take, pk, p) for pk, p in zip(pkeyps, keyps))
    nvals = tuple(
        jnp.where(take, _partner(v, flat, j, jr, is_row), v) for v in vals
    )
    return nkeyps, nvals


def _bitonic_body(nlog: int, keyps, vals, flat):
    """Full bitonic network over (R, 128) arrays; returns sorted arrays."""

    def outer(kk, carry):
        keyps, vals = carry
        k = jnp.int32(2) << kk

        def inner(t, carry2):
            keyps2, vals2 = carry2
            j = (jnp.int32(1) << (kk - t)).astype(jnp.int32)
            return bitonic_stages(keyps2, vals2, flat, j, k)

        return jax.lax.fori_loop(
            jnp.int32(0), kk + jnp.int32(1), inner, (keyps, vals)
        )

    # int32 loop bounds: under jax_enable_x64 Python-int bounds make the
    # loop index i64, which Mosaic rejects and whose narrowing conversion
    # hits a trace-time recursion inside Pallas kernels.
    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlog), outer, (keyps, vals))


def _make_kernel(nlog: int, nk: int, nv: int, stable: bool):
    def kernel(*refs):
        nin = nk + nv
        krefs = refs[:nk]
        vrefs = refs[nk:nin]
        outs = refs[nin:]
        R = krefs[0].shape[0]
        ri = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        flat = ri * LANES + li
        keyps = tuple(r[:] for r in krefs)
        if stable:
            # padded position as the last compare plane: ties resolve to
            # input order, and padding sentinels can never swap with a
            # real max-valued key's payload
            keyps = keyps + (flat,)
        vals = tuple(v[:] for v in vrefs)
        keyps, vals = _bitonic_body(nlog, keyps, vals, flat)
        for o, p in zip(outs, keyps[:nk] + vals):
            o[:] = p

    return kernel


def _split_planes(x):
    """8-byte array -> two order-isomorphic int32 planes (hi, lo); 4-byte ->
    one int32 plane preserving its natural order."""
    if x.dtype.itemsize == 8:
        u = x.view(jnp.uint64) if x.dtype != jnp.uint64 else x
        hi = (u >> np.uint64(32)).astype(jnp.uint32)
        lo = (u & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        if jnp.issubdtype(x.dtype, jnp.signedinteger):
            # int64 order = (hi as int32, lo as uint32) lex order
            hi_p = hi.astype(jnp.int32)
        else:
            hi_p = (hi ^ np.uint32(0x80000000)).view(jnp.int32)
        lo_p = (lo ^ np.uint32(0x80000000)).view(jnp.int32)
        return [hi_p, lo_p]
    if jnp.issubdtype(x.dtype, jnp.unsignedinteger):
        return [(x ^ np.uint32(0x80000000)).view(jnp.int32)]
    return [x.view(jnp.int32) if x.dtype != jnp.int32 else x]


def _join_planes(planes, dtype):
    """Inverse of :func:`_split_planes`."""
    dtype = jnp.dtype(dtype)
    if dtype.itemsize == 8:
        hi_p, lo_p = planes
        if jnp.issubdtype(dtype, jnp.signedinteger):
            hi = hi_p.view(jnp.uint32)
        else:
            hi = (hi_p.view(jnp.uint32)) ^ np.uint32(0x80000000)
        lo = lo_p.view(jnp.uint32) ^ np.uint32(0x80000000)
        u = (hi.astype(jnp.uint64) << np.uint64(32)) | lo.astype(jnp.uint64)
        return u.view(dtype) if dtype != jnp.uint64 else u
    (p,) = planes
    if jnp.issubdtype(dtype, jnp.unsignedinteger):
        return (p.view(jnp.uint32) ^ np.uint32(0x80000000)).view(dtype)
    return p.view(dtype) if dtype != jnp.dtype(jnp.int32) else p


def bitonic_sort_block(
    keys: jnp.ndarray,
    values: tuple = (),
    stable: bool = False,
    interpret: bool = False,
):
    """Sort a 1-D array (padded to a power of two with dtype-max sentinels)
    entirely in VMEM; returns (sorted_keys, sorted_values_tuple).

    ``keys`` must be an integer dtype whose natural order is the sort order;
    4- and 8-byte keys and values are both supported on TPU (8-byte arrays
    ride as two int32 planes, see module docstring).

    With ``values``, the sort is always index-tiebroken (``stable`` is
    implied): the padding sentinel is the key dtype's max, so a real max-key
    pair would otherwise be interchangeable with padding in the key-only
    network and could surrender its payload slot to a padding zero.
    """
    if values:
        stable = True
    if keys.dtype.itemsize not in (4, 8):
        raise TypeError(
            f"bitonic sorts 4/8-byte integer keys, got {keys.dtype}; "
            "encode smaller dtypes to uint32 first (ops/common.encode_keys)"
        )
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
    key_planes = _split_planes(kp)
    val_planes = []
    val_spec = []  # (dtype, nplanes) to reassemble
    for v in vps:
        if v.dtype.itemsize not in (4, 8):
            raise TypeError(f"bitonic carries 4/8-byte values, got {v.dtype}")
        ps = _split_planes(v) if v.dtype.itemsize == 8 else [v]
        val_planes.extend(ps)
        val_spec.append((v.dtype, len(ps)))
    nk, nv = len(key_planes), len(val_planes)
    args = [p.reshape(R, LANES) for p in key_planes + val_planes]
    kernel = _make_kernel(nlog, nk, nv, stable)
    out_shapes = [jax.ShapeDtypeStruct((R, LANES), a.dtype) for a in args]
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )
    if jax.config.jax_enable_x64:
        # Trace the kernel with x64 semantics off: under jax_enable_x64,
        # Python-int operands in the network's index math promote through
        # i64, which Mosaic rejects and whose narrowing conversion hits a
        # trace-time recursion inside Pallas. Every kernel array is a
        # 4-byte plane by construction, so x64-off tracing is
        # semantics-preserving.
        from jax._src.config import enable_x64  # no public context manager

        with enable_x64(False):
            outs = call(*args)
    else:
        outs = call(*args)
    outs = [o.reshape(-1)[:n] for o in outs]
    out_k = _join_planes(outs[:nk], keys.dtype)
    out_v = []
    pos = nk
    for dtype, k in val_spec:
        plane = outs[pos : pos + k]
        out_v.append(_join_planes(plane, dtype) if k == 2 else plane[0])
        pos += k
    return out_k, tuple(out_v)
