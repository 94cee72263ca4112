"""Degenerate-size edges: every engine must pass N=0/1/2 through exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vkradixsort_tpu as vk

INTERPRET = jax.default_backend() != "tpu"
CFG = vk.SortConfig(interpret=INTERPRET)


@pytest.mark.parametrize("n", [0, 1, 2])
@pytest.mark.parametrize(
    "engine", ["reference", "tiled", "merge", "bitonic", "samplesort", "radix_tiled"]
)
def test_tiny_n(n, engine):
    k = jnp.asarray(np.arange(n, dtype=np.uint32)[::-1].copy())
    out = np.asarray(vk.sort(k, config=CFG, backend=engine))
    np.testing.assert_array_equal(out, np.sort(np.asarray(k)))


def test_tiny_n_pairs():
    for n in [0, 1, 2]:
        k = jnp.asarray(np.zeros(n, np.uint32))
        v = jnp.asarray(np.arange(n, dtype=np.int32))
        ok, ov = vk.sort_pairs(k, v, config=CFG)
        assert ok.shape == (n,) and ov.shape == (n,)
        np.testing.assert_array_equal(np.asarray(ov), np.arange(n, dtype=np.int32))


@pytest.mark.parametrize("n", [0, 1, 2])
def test_tiny_n_merge_dispatch_kv_argsort(n):
    """Dispatch-level encode/decode through the merge engine at tiny N —
    the plane-level edges live in test_merge.py; this covers the public
    sort_pairs/argsort entry points routing backend='merge'."""
    k = jnp.asarray(np.arange(n, dtype=np.int32)[::-1] - 1)
    v = jnp.asarray(np.arange(n, dtype=np.uint32) + 7)
    ok, ov = vk.sort_pairs(k, v, config=CFG, backend="merge")
    perm = np.argsort(np.asarray(k), kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), np.sort(np.asarray(k)))
    np.testing.assert_array_equal(np.asarray(ov), (np.asarray(v))[perm])
    pa = np.asarray(vk.argsort(k, config=CFG, backend="merge"))
    np.testing.assert_array_equal(pa, perm.astype(pa.dtype))
