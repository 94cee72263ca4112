"""Key encodings, digit extraction, and shape helpers shared by every sort path.

The reference sorts raw ``uint`` keys and tells callers to pre-transform
signed/float data themselves (reference README.md:98: "the keys have to be
unsigned integers... map them to the unsigned integers"). We build that
mapping in as a first-class, invertible encoding so the public API accepts
uint32/uint64/int32/int64/float32/float64 keys directly.

Digit extraction mirrors the reference's ``(element >> shift) & 255``
(reference multiradixsort/resources/shaders/multi_radixsort_histograms.comp:46
and single_radixsort.comp:53) but is vectorized over whole tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Radix configuration: 8-bit digits, 256 bins, like the reference's
# RADIX_SORT_BINS=256 (single_radixsort.comp:13). 4 passes for 32-bit keys,
# 8 for 64-bit (single_radixsort.comp:14 ITERATIONS and
# multiradixsort/src/MultiRadixSort.cpp:51-55 NUM_ITERATIONS 4<->8).
BITS_PER_PASS = 8
NUM_BINS = 1 << BITS_PER_PASS


def num_passes(dtype) -> int:
    """Number of 8-bit LSD passes for a sortable unsigned dtype."""
    nbits = jnp.dtype(dtype).itemsize * 8
    assert nbits % BITS_PER_PASS == 0
    return nbits // BITS_PER_PASS


def sortable_dtype(dtype) -> jnp.dtype:
    """The unsigned dtype whose ascending order realizes `dtype`'s order."""
    dtype = jnp.dtype(dtype)
    if dtype.itemsize <= 4:
        return jnp.dtype(jnp.uint32)
    return jnp.dtype(jnp.uint64)


def encode_keys(keys: jnp.ndarray) -> jnp.ndarray:
    """Map keys to unsigned ints whose ascending uint order == key order.

    - unsigned ints: identity (widened to u32/u64)
    - signed ints:   flip the sign bit
    - floats:        IEEE-754 total-order trick — negative values get all
                     bits flipped, positives get the sign bit set. NaNs sort
                     after +inf (matching np.sort's NaN-last convention).
    """
    dtype = keys.dtype
    if dtype.itemsize == 8 and not jax.config.jax_enable_x64:  # pragma: no cover
        raise TypeError("64-bit keys need jax_enable_x64=True")
    if jnp.issubdtype(dtype, jnp.unsignedinteger):
        return keys.astype(sortable_dtype(dtype))
    if jnp.issubdtype(dtype, jnp.signedinteger):
        udt = sortable_dtype(dtype)
        u = keys.astype({1: jnp.int8, 2: jnp.int16, 4: jnp.int32, 8: jnp.int64}[dtype.itemsize])
        bits = u.view({1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32, 8: jnp.uint64}[dtype.itemsize])
        flipped = bits ^ np.asarray(1 << (dtype.itemsize * 8 - 1), bits.dtype)
        return flipped.astype(udt)
    if jnp.issubdtype(dtype, jnp.floating):
        if dtype.itemsize == 2:
            # float16 / bfloat16: same sign-flip trick on the 16-bit pattern,
            # widened to the u32 sort domain.
            bits = keys.view(jnp.uint16)
            sign = bits >> np.uint16(15)
            mask = jnp.where(sign == 1, np.uint16(0xFFFF), np.uint16(0x8000))
            return (bits ^ mask).astype(jnp.uint32)
        if dtype.itemsize == 4:
            bits = keys.view(jnp.uint32)
            sign = bits >> np.uint32(31)
            mask = jnp.where(sign == 1, np.uint32(0xFFFFFFFF), np.uint32(0x80000000))
            return bits ^ mask
        if dtype.itemsize == 8:
            bits = keys.view(jnp.uint64)
            sign = bits >> np.uint64(63)
            mask = jnp.where(
                sign == 1, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0x8000000000000000)
            )
            return bits ^ mask
    raise TypeError(f"unsupported key dtype {dtype}")


def decode_keys(encoded: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of :func:`encode_keys` back to the original dtype."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.unsignedinteger):
        return encoded.astype(dtype)
    if jnp.issubdtype(dtype, jnp.signedinteger):
        nbits = dtype.itemsize * 8
        narrow_u = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32, 8: jnp.uint64}[dtype.itemsize]
        bits = encoded.astype(narrow_u) ^ np.asarray(1 << (nbits - 1), narrow_u)
        return bits.view(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        if dtype.itemsize == 2:
            bits = encoded.astype(jnp.uint16)
            sign = bits >> np.uint16(15)
            mask = jnp.where(sign == 0, np.uint16(0xFFFF), np.uint16(0x8000))
            return (bits ^ mask).view(dtype)
        if dtype.itemsize == 4:
            bits = encoded.astype(jnp.uint32)
            sign = bits >> np.uint32(31)
            mask = jnp.where(sign == 0, np.uint32(0xFFFFFFFF), np.uint32(0x80000000))
            return (bits ^ mask).view(jnp.float32)
        if dtype.itemsize == 8:
            bits = encoded.astype(jnp.uint64)
            sign = bits >> np.uint64(63)
            mask = jnp.where(
                sign == 0, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0x8000000000000000)
            )
            return (bits ^ mask).view(jnp.float64)
    raise TypeError(f"unsupported key dtype {dtype}")


def extract_digit(keys: jnp.ndarray, shift: int) -> jnp.ndarray:
    """``(key >> shift) & 0xFF`` as int32 (the TPU-native index dtype)."""
    return ((keys >> np.asarray(shift, keys.dtype)) & np.asarray(0xFF, keys.dtype)).astype(
        jnp.int32
    )


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=None)
def _max_key_np(dtype_str: str):
    return np.asarray(np.iinfo(np.dtype(dtype_str)).max, np.dtype(dtype_str))


def pad_sentinel(dtype) -> np.ndarray:
    """Max value of the unsigned key dtype; padding sorts to the end."""
    return _max_key_np(str(jnp.dtype(dtype)))


def pad_to(keys: jnp.ndarray, n_padded: int) -> jnp.ndarray:
    """Pad a 1-D key array with end-sorting sentinels to length ``n_padded``."""
    n = keys.shape[0]
    if n == n_padded:
        return keys
    return jnp.concatenate(
        [keys, jnp.full((n_padded - n,), pad_sentinel(keys.dtype), keys.dtype)]
    )


def composite_searchsorted(k_sorted, g_sorted, qk, qg):
    """Count of pairs (k, g) lexicographically < (qk, qg), vectorized over
    the queries. ``(k_sorted, g_sorted)`` must be lexicographically sorted.
    O(|q| log n) time, O(|q|) memory — used for composite (key, position)
    bucket boundaries where materializing an (n, |q|) tie matrix would be
    prohibitive."""
    n = k_sorted.shape[0]
    lo = jnp.zeros(qk.shape, jnp.int32)
    hi = jnp.full(qk.shape, n, jnp.int32)
    steps = int(np.ceil(np.log2(max(n, 2)))) + 1

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        safe = jnp.minimum(mid, n - 1)
        mk = jnp.take(k_sorted, safe)
        mg = jnp.take(g_sorted, safe)
        lt = (mk < qk) | ((mk == qk) & (mg < qg))
        active = lo < hi
        return (
            jnp.where(active & lt, mid + 1, lo),
            jnp.where(active & ~lt, mid, hi),
        )

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo
