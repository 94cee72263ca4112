"""Public segmented sort and half-precision (f16/bf16) key support."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vkradixsort_tpu as vk
from vkradixsort_tpu.ops.common import decode_keys, encode_keys
from tests.conftest import make_keys


def test_sort_segments_keys(rng):
    k = make_keys(rng, 64 * 2048, np.uint32, "uniform").reshape(64, 2048)
    out = np.asarray(vk.sort_segments(jnp.asarray(k)))
    np.testing.assert_array_equal(out, np.sort(k, axis=1))


def test_sort_segments_kv_stable(rng):
    k = (make_keys(rng, 16 * 512, np.uint32, "uniform") % 17).reshape(16, 512)
    v = np.tile(np.arange(512, dtype=np.int32), (16, 1))
    ok, ov = vk.sort_segments(jnp.asarray(k), jnp.asarray(v))
    perm = np.argsort(k, axis=1, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), np.take_along_axis(k, perm, 1))
    np.testing.assert_array_equal(np.asarray(ov), perm.astype(np.int32))


def test_sort_segments_int_and_float(rng):
    k = rng.standard_normal((8, 256)).astype(np.float32)
    out = np.asarray(vk.sort_segments(jnp.asarray(k)))
    np.testing.assert_array_equal(out, np.sort(k, axis=1))
    ki = rng.integers(-1000, 1000, size=(8, 256), dtype=np.int64)
    outi = np.asarray(vk.sort_segments(jnp.asarray(ki)))
    np.testing.assert_array_equal(outi, np.sort(ki, axis=1))


def test_sort_segments_rejects_1d(rng):
    with pytest.raises(ValueError, match="2-D"):
        vk.sort_segments(jnp.arange(8, dtype=jnp.uint32))


def test_float16_sort(rng):
    k = rng.standard_normal(10_000).astype(np.float16)
    out = np.asarray(vk.sort(jnp.asarray(k)))
    np.testing.assert_array_equal(out.view(np.uint16),
                                  np.sort(k).view(np.uint16))


def test_float16_specials_total_order():
    k = np.array([1.5, -1.5, 0.0, -0.0, np.inf, -np.inf, 65000.0, -65000.0],
                 np.float16)
    out = np.asarray(vk.sort(jnp.asarray(k)))
    expect = np.array([-np.inf, -65000.0, -1.5, -0.0, 0.0, 1.5, 65000.0, np.inf],
                      np.float16)
    np.testing.assert_array_equal(out.view(np.uint16), expect.view(np.uint16))


def test_bfloat16_sort(rng):
    import ml_dtypes

    k = rng.standard_normal(8_192).astype(ml_dtypes.bfloat16)
    out = np.asarray(vk.sort(jnp.asarray(k)))
    np.testing.assert_array_equal(
        out.view(np.uint16), np.sort(k).view(np.uint16)
    )


def test_half_float_roundtrip(rng):
    for dt in [np.float16]:
        k = jnp.asarray(rng.standard_normal(4096).astype(dt))
        enc = encode_keys(k)
        assert enc.dtype == jnp.uint32
        back = decode_keys(enc, dt)
        np.testing.assert_array_equal(
            np.asarray(back).view(np.uint16), np.asarray(k).view(np.uint16)
        )
    kb = jnp.asarray(rng.standard_normal(4096), dtype=jnp.bfloat16)
    back = decode_keys(encode_keys(kb), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(back).view(np.uint16), np.asarray(kb).view(np.uint16)
    )


def test_half_float_argsort_stable(rng):
    k = (rng.integers(0, 7, size=3000)).astype(np.float16)
    perm = np.asarray(vk.argsort(jnp.asarray(k)))
    np.testing.assert_array_equal(perm, np.argsort(k, kind="stable"))
