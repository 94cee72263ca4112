"""Size/dtype-adaptive public sort API (SURVEY.md §7 L3).

The reference ships two separate hard-wired programs and documents "use
single for N < ~10k, multi otherwise" (reference README.md:11-22). Here the
regime split is a dispatcher: one public ``sort`` / ``sort_pairs`` /
``argsort`` that routes to

  * the fused in-VMEM Pallas kernel for small N (single_radixsort analog),
  * the tiled multi-pass pipeline for large N (multi_radixsort analog),
  * the pure-jnp reference path on non-TPU backends.

All entry points are jit-compatible, stable, and bitwise-exact vs np.sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vkradixsort_tpu.engine.config import DEFAULT_CONFIG, SortConfig
from vkradixsort_tpu.ops import reference
from vkradixsort_tpu.ops.common import decode_keys, encode_keys


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _available(path: str) -> bool:
    try:
        if path == "fused":
            import vkradixsort_tpu.ops.fused  # noqa: F401
        elif path == "tiled":
            import vkradixsort_tpu.ops.tiled  # noqa: F401
        return True
    except ImportError:
        return False


def _route(n: int, config: SortConfig, backend: str | None) -> str:
    if backend is not None:
        return backend
    if not _on_tpu():
        return "reference"
    if n <= config.fused_max_n and _available("fused"):
        return "fused"
    if n > config.fused_max_n and _available("tiled"):
        return "tiled"
    return "reference"


def _sort_encoded(enc, values, config: SortConfig, path: str):
    """Sort already-encoded uint keys via the selected path."""
    if path == "fused":
        from vkradixsort_tpu.ops import fused

        return fused.sort_fused(enc, values, config)
    if path == "tiled":
        from vkradixsort_tpu.ops import tiled

        return tiled.sort_tiled(enc, values, config)
    if path == "reference":
        return reference._sort_encoded(enc, values, num_chunks=1)
    raise ValueError(f"unknown sort path {path!r}")


def sort(
    keys: jnp.ndarray,
    *,
    config: SortConfig = DEFAULT_CONFIG,
    backend: str | None = None,
) -> jnp.ndarray:
    """Stable ascending sort of a 1-D key array.

    Analog of running the reference's whole SingleRadixSort/MultiRadixSort
    drivers (SingleRadixSort.h:21, MultiRadixSort.h:21), as a function.

    Float keys sort by IEEE-754 **total order** (the standard radix-sort
    convention): ``-NaN < -inf < ... < -0.0 < +0.0 < ... < +inf < +NaN``.
    This is value-equal to ``np.sort`` except that ``-0.0`` orders strictly
    before ``+0.0`` (np treats them as ties) and negative-signed NaNs sort
    first rather than last.
    """
    if keys.ndim != 1:
        raise ValueError(f"sort expects 1-D keys, got shape {keys.shape}")
    path = _route(keys.shape[0], config, backend)
    enc = encode_keys(keys)
    out, _ = _sort_encoded(enc, None, config, path)
    return decode_keys(out, keys.dtype)


def sort_pairs(
    keys: jnp.ndarray,
    values: jnp.ndarray,
    *,
    config: SortConfig = DEFAULT_CONFIG,
    backend: str | None = None,
):
    """Stable key-value sort; values ride along with their keys."""
    if keys.ndim != 1 or values.shape[0] != keys.shape[0]:
        raise ValueError(
            f"sort_pairs expects matching 1-D arrays, got {keys.shape} / {values.shape}"
        )
    path = _route(keys.shape[0], config, backend)
    enc = encode_keys(keys)
    out_k, out_v = _sort_encoded(enc, values, config, path)
    return decode_keys(out_k, keys.dtype), out_v


def argsort(
    keys: jnp.ndarray,
    *,
    config: SortConfig = DEFAULT_CONFIG,
    backend: str | None = None,
) -> jnp.ndarray:
    """Stable argsort indices (uint32 for N < 2^32)."""
    idx_dtype = jnp.uint32 if keys.shape[0] < (1 << 32) else jnp.uint64
    idx = jnp.arange(keys.shape[0], dtype=idx_dtype)
    _, perm = sort_pairs(keys, idx, config=config, backend=backend)
    return perm
