"""Pure-jnp LSD radix sort — the in-package oracle (SURVEY.md §7 L0).

This is the structural analog of the reference's CPU ``std::sort`` baseline
(reference singleradixsort/src/SingleRadixSort.cpp:106-111) except it is
itself a radix sort decomposed into the same three phases the device kernels
use — per-chunk histogram, global exclusive scan, stable rank-and-scatter —
so each phase can be unit-tested against numpy before the Pallas versions
exist. Runs on any backend (tests run it on CPU).

Phases mirror the reference pipeline:
  chunk_histograms      <-> multi_radixsort_histograms.comp:31-55
  exclusive_bin_offsets <-> multi_radixsort.comp:56-76 (global scan)
  radix_pass            <-> multi_radixsort.comp:83-126 (rank + scatter)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vkradixsort_tpu.ops.common import (
    BITS_PER_PASS,
    NUM_BINS,
    decode_keys,
    encode_keys,
    extract_digit,
    num_passes,
)


def chunk_histograms(keys: jnp.ndarray, shift: int, num_chunks: int) -> jnp.ndarray:
    """Per-chunk 256-bin histograms of digit ``(key >> shift) & 0xFF``.

    Returns [num_chunks, 256] int32, chunk-major like the reference's
    ``g_histograms[256 * wID + binID]`` layout
    (multi_radixsort_histograms.comp:24-27).
    """
    n = keys.shape[0]
    assert n % num_chunks == 0
    digits = extract_digit(keys, shift).reshape(num_chunks, n // num_chunks)
    one_hot = jax.nn.one_hot(digits, NUM_BINS, dtype=jnp.int32)
    return one_hot.sum(axis=1)


def exclusive_bin_offsets(hist: jnp.ndarray) -> jnp.ndarray:
    """Global digit offsets per chunk: [num_chunks, 256] exclusive scan.

    Bin-major order: offset[c, b] = (total count of bins < b)
                                  + (count of bin b in chunks < c).
    Log-depth, unlike the reference's serial per-workgroup loop
    (multi_radixsort.comp:56-63) which SURVEY.md §7 flags as non-reusable.
    """
    flat = hist.T.reshape(-1)  # bin-major: [b * num_chunks + c]
    scanned = jnp.cumsum(flat) - flat  # exclusive
    return scanned.reshape(hist.shape[1], hist.shape[0]).T


def rank_in_chunk(digits: jnp.ndarray) -> jnp.ndarray:
    """Stable intra-chunk rank: # of earlier elements with the same digit.

    digits: [num_chunks, chunk]; returns same-shape int32. This is the
    TPU-friendly replacement for the reference's subgroup ballot/popcount
    ranking (single_radixsort.comp:117-128): an exclusive cumulative sum of
    the digit one-hot along the chunk, evaluated at each element's own bin.
    """
    one_hot = jax.nn.one_hot(digits, NUM_BINS, dtype=jnp.int32)
    incl = jnp.cumsum(one_hot, axis=1)
    return jnp.take_along_axis(incl, digits[..., None], axis=2)[..., 0] - 1


def radix_pass(
    keys: jnp.ndarray,
    values: jnp.ndarray | None,
    shift: int,
    num_chunks: int = 1,
):
    """One stable 8-bit LSD pass: returns reordered (keys, values)."""
    n = keys.shape[0]
    digits2d = extract_digit(keys, shift).reshape(num_chunks, n // num_chunks)
    hist = chunk_histograms(keys, shift, num_chunks)
    base = exclusive_bin_offsets(hist)  # [chunks, 256]
    rank = rank_in_chunk(digits2d)  # [chunks, chunk]
    dest = (jnp.take_along_axis(base, digits2d, axis=1) + rank).reshape(-1)
    out_keys = jnp.zeros_like(keys).at[dest].set(keys, mode="drop")
    out_values = None
    if values is not None:
        out_values = jnp.zeros_like(values).at[dest].set(values, mode="drop")
    return out_keys, out_values


@functools.partial(jax.jit, static_argnames=("num_chunks",))
def _sort_encoded(keys: jnp.ndarray, values, num_chunks: int):
    for p in range(num_passes(keys.dtype)):
        keys, values = radix_pass(keys, values, p * BITS_PER_PASS, num_chunks)
    return keys, values


def radix_sort_reference(
    keys: jnp.ndarray,
    values: jnp.ndarray | None = None,
    num_chunks: int = 1,
):
    """Full stable LSD radix sort of (keys[, values]) — the jnp oracle.

    Equivalent observable behavior to the reference's end-to-end drivers
    (SingleRadixSort.cpp:5-47, MultiRadixSort.cpp:5-81): stable ascending
    sort, exact bitwise agreement with std::sort / np.sort.
    """
    orig_dtype = keys.dtype
    enc = encode_keys(keys)
    out_keys, out_values = _sort_encoded(enc, values, num_chunks)
    out_keys = decode_keys(out_keys, orig_dtype)
    if values is None:
        return out_keys
    return out_keys, out_values


def argsort_reference(keys: jnp.ndarray, num_chunks: int = 1) -> jnp.ndarray:
    """Stable argsort built from the same radix passes."""
    idx_dtype = jnp.uint32 if keys.shape[0] < (1 << 32) else jnp.uint64
    idx = jnp.arange(keys.shape[0], dtype=idx_dtype)
    _, perm = radix_sort_reference(keys, idx, num_chunks)
    return perm
