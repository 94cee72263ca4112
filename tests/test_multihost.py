"""Multi-host layer logic, exercised single-process (no pod needed).

ensure_initialized must be a safe no-op here; the mesh/global-array helpers
must compose with sort_sharded on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vkradixsort_tpu.parallel import multihost
from vkradixsort_tpu.parallel.distributed import gather_sorted, sort_sharded
from tests.conftest import make_keys

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)


def test_ensure_initialized_single_process_noop():
    assert multihost.ensure_initialized() is False
    assert jax.process_count() == 1


def test_global_mesh_host_major_order():
    mesh = multihost.global_mesh_1d("x")
    assert mesh.axis_names == ("x",)
    devs = list(mesh.devices.flat)
    keys = [(d.process_index, d.id) for d in devs]
    assert keys == sorted(keys)
    assert len(devs) == len(jax.devices())


def test_global_array_feeds_sort_sharded(rng):
    mesh = multihost.global_mesh_1d("x")
    P = mesh.shape["x"]
    n = P * P * 256
    keys = make_keys(rng, n, np.uint32, "uniform")
    garr = multihost.global_array_from_host_data(keys, mesh)
    assert garr.shape == (n,)
    pk, counts, overflow = sort_sharded(garr, mesh)
    assert not np.any(np.asarray(overflow))
    np.testing.assert_array_equal(gather_sorted(pk, counts), np.sort(keys))
