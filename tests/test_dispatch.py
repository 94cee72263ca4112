"""Public API dispatch: every engine yields the identical exact result.

The reference validates each program against std::sort separately
(SingleRadixSort.cpp:113-126, MultiRadixSort.cpp:148-161); here one suite
drives all engines through the same public entry points.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vkradixsort_tpu as vk
from tests.conftest import make_keys

INTERPRET = jax.default_backend() != "tpu"
CFG = vk.SortConfig(interpret=INTERPRET)

# engines excluding "fused" (its interpret-mode runtime is minutes even at
# 4k; test_fused.py covers it at small sizes)
ENGINES = ["tiled", "bitonic", "samplesort", "radix_tiled", "reference"]


@pytest.mark.parametrize("engine", ENGINES)
def test_sort_engines_exact(rng, engine):
    k = make_keys(rng, 20_000, np.uint32, "uniform")
    out = np.asarray(vk.sort(jnp.asarray(k), config=CFG, backend=engine))
    np.testing.assert_array_equal(out, np.sort(k))


@pytest.mark.parametrize("engine", ["tiled", "bitonic", "radix_tiled", "reference"])
def test_sort_pairs_engines_stable(rng, engine):
    k = make_keys(rng, 8_192, np.uint32, "uniform") % 97  # heavy ties
    v = np.arange(k.size, dtype=np.uint32)
    ok, ov = vk.sort_pairs(jnp.asarray(k), jnp.asarray(v), config=CFG, backend=engine)
    perm = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), k[perm])
    np.testing.assert_array_equal(np.asarray(ov), perm.astype(np.uint32))


def test_samplesort_pairs_via_dispatch(rng):
    k = make_keys(rng, 70_000, np.uint32, "uniform") % 1009
    v = np.arange(1, 70_001, dtype=np.uint32)
    ok, ov = vk.sort_pairs(jnp.asarray(k), jnp.asarray(v),
                           config=CFG, backend="samplesort")
    perm = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), k[perm])
    np.testing.assert_array_equal(np.asarray(ov), v[perm])


def test_unknown_backend_raises(rng):
    k = jnp.asarray(make_keys(rng, 128, np.uint32, "uniform"))
    with pytest.raises(ValueError, match="unknown backend"):
        vk.sort(k, backend="quantum")


def test_default_route_off_tpu(rng):
    # Default routing must be exact for every supported dtype. float64 is
    # refused on TPU (f64 there is a float32 pair and would be perturbed).
    for dtype in [np.uint32, np.int32, np.float32, np.uint64, np.int64, np.float64]:
        k = make_keys(rng, 4_096, np.dtype(dtype).newbyteorder("="), "uniform")
        if dtype == np.float64 and jax.default_backend() == "tpu":
            with pytest.raises(TypeError, match="float64"):
                vk.sort(jnp.asarray(k))
            continue
        out = np.asarray(vk.sort(jnp.asarray(k)))
        np.testing.assert_array_equal(out, np.sort(k))


def test_argsort_stable_all_engines(rng):
    k = make_keys(rng, 4_096, np.uint32, "uniform") % 13
    for engine in ["tiled", "bitonic", "reference"]:
        perm = np.asarray(vk.argsort(jnp.asarray(k), config=CFG, backend=engine))
        np.testing.assert_array_equal(perm, np.argsort(k, kind="stable"))
