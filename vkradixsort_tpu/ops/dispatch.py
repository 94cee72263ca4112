"""Size/dtype-adaptive public sort API (SURVEY.md §7 L3).

The reference ships two separate hard-wired programs and documents "use
single for N < ~10k, multi otherwise" (reference README.md:11-22). Here the
regime split is a dispatcher: one public ``sort`` / ``sort_pairs`` /
``argsort`` that routes across interchangeable engines:

  engine        analog of                      use
  ------------  -----------------------------  --------------------------------
  "tiled"       multi_radixsort (production)   XLA sort in signed space; the
                                               measured-fastest exact path at
                                               every single-chip size (see
                                               BENCHMARKS.md)
  "bitonic"     single_radixsort (in-VMEM,     whole sort in ONE Pallas kernel;
                one kernel launch)             ~2 s compile, 0.5-1 G keys/s
  "fused"       single_radixsort (LSD radix    Pallas matmul-radix; structural
                digit passes, one kernel)      parity path — minutes to compile,
                                               never routed implicitly
  "samplesort"  multi_radixsort's histogram/   splitter partition + Pallas DMA
                scatter pipeline, re-designed  placement (keys and stable kv);
                around bulk DMA                basis of the distributed shuffle
  "radix_tiled" multi_radixsort histogram +    explicit per-digit histogram/
                scan + rank/scatter            scan/rank pipeline (Pallas)
  "reference"   the CPU std::sort oracle       pure-jnp radix sort, any backend

``backend=None`` picks by measured routing: the XLA tiled path on TPU (it
wins at every size we measured — narrow margins under 4k, 2-10x beyond),
the jnp reference path elsewhere. The reference's single-vs-multi crossover
(~10k keys on an RTX 3070) has no TPU analog single-chip: XLA compiles the
small-N sort into one fused kernel already, which IS the "single" regime.

All entry points are jit-compatible, stable, and bitwise-exact vs np.sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vkradixsort_tpu.engine.config import DEFAULT_CONFIG, SortConfig
from vkradixsort_tpu.ops import reference
from vkradixsort_tpu.ops.common import decode_keys, encode_keys

ENGINES = ("tiled", "bitonic", "fused", "samplesort", "radix_tiled", "reference")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _route(n: int, config: SortConfig, backend: str | None) -> str:
    if backend is not None:
        if backend not in ENGINES:
            raise ValueError(f"unknown backend {backend!r}; pick from {ENGINES}")
        return backend
    return "tiled" if _on_tpu() else "reference"


def _check_f64_on_tpu(keys) -> None:
    """float64 keys cannot be sorted exactly on TPU: the X64 rewriter
    represents f64 as a float32 pair (<53-bit mantissa, measured 1-ulp
    output perturbation) and f64<->u64 bitcasts are unimplemented, so
    neither the native comparator nor the total-order encoding is exact.
    A sort that perturbs its keys is worse than an error."""
    if keys.dtype == jnp.float64 and _on_tpu():
        raise TypeError(
            "float64 keys are not supported on the TPU backend (f64 is "
            "emulated as a float32 pair there and would be perturbed); "
            "sort float64 on CPU, or use float32/int64/uint64 keys"
        )


def _sort_encoded(enc, values, config: SortConfig, path: str):
    """Sort already-encoded unsigned keys via the selected engine."""
    if path == "tiled":
        from vkradixsort_tpu.ops import tiled

        return tiled.sort_tiled(enc, values, config)
    if path == "bitonic":
        from vkradixsort_tpu.ops import bitonic, segsort

        s = segsort.to_signed_order(enc)
        vals = () if values is None else (values,)
        out_s, out_v = bitonic.bitonic_sort_block(
            s, vals, stable=bool(vals), interpret=config.interpret
        )
        out_k = segsort.from_signed_order(out_s, enc.dtype)
        return out_k, (out_v[0] if vals else None)
    if path == "fused":
        from vkradixsort_tpu.ops import fused

        return fused.sort_fused(enc, values, config)
    if path == "samplesort":
        from vkradixsort_tpu.ops import samplesort

        if values is None:
            out = samplesort.sort_samplesort(enc, interpret=config.interpret)
            return out, None
        return samplesort.sort_pairs_samplesort(
            enc, values, interpret=config.interpret
        )
    if path == "radix_tiled":
        from vkradixsort_tpu.ops import radix_tiled

        return radix_tiled.sort_radix_tiled(enc, values, interpret=config.interpret)
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
    _check_f64_on_tpu(keys)
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
    _check_f64_on_tpu(keys)
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


def sort_segments(
    keys: jnp.ndarray,
    values: jnp.ndarray | None = None,
):
    """Sort every row of a 2-D array independently (batched segment sort).

    This is the hardware's sweet spot: TPU runs the per-segment networks
    lockstep across rows entirely in VMEM — measured ~5 G keys/s at segment
    width 2048 on v5e, ~9x the flat large-N rate (BENCHMARKS.md). The
    reference has no segmented entry point; it falls naturally out of the
    TPU-first design and is the building block the distributed shuffle and
    samplesort stages use internally.

    Stable per row when ``values`` ride along. Returns ``sorted_keys`` or
    ``(sorted_keys, permuted_values)``.
    """
    if keys.ndim != 2:
        raise ValueError(f"sort_segments expects 2-D keys, got {keys.shape}")
    _check_f64_on_tpu(keys)
    from vkradixsort_tpu.ops import segsort

    enc = encode_keys(keys)
    s = segsort.to_signed_order(enc)
    ops = (s,) if values is None else (s, values)
    out = jax.lax.sort(ops, dimension=1, is_stable=values is not None, num_keys=1)
    out_k = decode_keys(segsort.from_signed_order(out[0], enc.dtype), keys.dtype)
    if values is None:
        return out_k
    return out_k, out[1]
