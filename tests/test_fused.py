"""Fused in-VMEM kernel tests (interpret mode on CPU; real TPU via VKRS_TEST_TPU=1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vkradixsort_tpu.engine.config import SortConfig
from vkradixsort_tpu.ops import common, fused
from tests.conftest import make_keys

import os

import jax

INTERPRET = jax.default_backend() != "tpu"
CFG = SortConfig(interpret=INTERPRET)

# On real TPU each fused kernel geometry compiles in ~10-20 s (BENCHMARKS.md);
# the kernel is exactness-tested in interpret mode on every CPU run, so only
# opt into device compiles explicitly to keep the TPU suite fast.
if not INTERPRET and not os.environ.get("VKRS_TEST_FUSED"):
    pytestmark = __import__("pytest").mark.skip(
        reason="fused kernel compiles ~10-20 s/shape on TPU; set VKRS_TEST_FUSED=1"
    )


def _run(keys_np, values_np=None):
    enc = common.encode_keys(jnp.asarray(keys_np))
    vals = None if values_np is None else jnp.asarray(values_np)
    out_k, out_v = fused.sort_fused(enc, vals, CFG)
    out_k = np.asarray(common.decode_keys(out_k, keys_np.dtype))
    return out_k, (None if out_v is None else np.asarray(out_v))


@pytest.mark.parametrize("n", [5, 100, 1000, 4096, 10_000])
@pytest.mark.parametrize("dist", ["uniform28", "uniform", "descending", "constant", "zipf"])
def test_fused_u32(rng, n, dist):
    keys = make_keys(rng, n, np.uint32, dist)
    got, _ = _run(keys)
    np.testing.assert_array_equal(got, np.sort(keys))


def test_fused_u32_pairs_stability(rng):
    keys = make_keys(rng, 6000, np.uint32, "uniform") % 13
    vals = np.arange(6000, dtype=np.uint32)
    got_k, got_v = _run(keys, vals)
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(got_v, perm.astype(np.uint32))
    np.testing.assert_array_equal(got_k, keys[perm])


def test_fused_u64(rng):
    keys = make_keys(rng, 3000, np.uint64, "uniform")
    got, _ = _run(keys)
    np.testing.assert_array_equal(got, np.sort(keys))


def test_fused_pairs_u64_values(rng):
    keys = make_keys(rng, 2048, np.uint32, "uniform")
    vals = make_keys(rng, 2048, np.uint64, "uniform")
    got_k, got_v = _run(keys, vals)
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(got_k, keys[perm])
    np.testing.assert_array_equal(got_v, vals[perm])


def test_fused_float_payload(rng):
    keys = make_keys(rng, 1500, np.uint32, "uniform")
    vals = rng.random(1500).astype(np.float32)
    got_k, got_v = _run(keys, vals)
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(got_v.view(np.uint32), vals[perm].view(np.uint32))
