"""Multi-host (DCN) support for the distributed sort.

The reference is strictly single-process/single-GPU (SURVEY.md §1); this
layer is the north-star extension to multi-host TPU slices (BASELINE.json:
">=70% 1->4 host scaling efficiency on a v5p slice"). It is deliberately
thin: JAX's runtime owns process bootstrap and cross-host collectives, so
all this module does is

  * initialize the distributed runtime exactly once per process
    (``ensure_initialized`` — a no-op under a single process or when the
    TPU runtime already bootstrapped via megascale env vars),
  * build the canonical 1-D global mesh over every chip of every host,
    DCN-major so that ``sort_sharded``'s single all-to-all crosses DCN the
    minimum number of times,
  * assemble a global sharded array from per-host shards
    (``global_array_from_host_data``).

``parallel.distributed.sort_sharded`` then works unchanged over the global
mesh: XLA lowers the same ``lax.all_to_all``/``all_gather`` to ICI within a
host and DCN across hosts.

Cannot be exercised on this single-host dev box; the logic that CAN be
tested without a pod (splitters, shuffle, stability) runs in CI on a
virtual 8-device CPU mesh (tests/test_distributed.py), exactly as SURVEY.md
§4 prescribes.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_INITIALIZED = False


def ensure_initialized(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize ``jax.distributed`` once; returns True if multi-process.

    With no arguments, relies on JAX's auto-detection (TPU pod metadata /
    megascale env). Explicit arguments follow ``jax.distributed.initialize``.
    Safe to call repeatedly and from single-process runs.
    """
    global _INITIALIZED
    # Decide from args/env BEFORE touching any jax backend query:
    # jax.process_count() instantiates the local backend, after which
    # jax.distributed.initialize() raises ("must be called before backends
    # are initialized") — probing first would make explicit multi-host
    # init impossible.
    want_multi = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if want_multi and not _INITIALIZED:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:  # pragma: no cover - needs a live cluster
            # The TPU runtime may have bootstrapped the distributed service
            # itself (megascale); "already initialized" is success.
            if "already" not in str(e).lower():
                raise
    _INITIALIZED = True
    return jax.process_count() > 1


def global_mesh_1d(axis_name: str = "x") -> jax.sharding.Mesh:
    """1-D mesh over all devices of all processes, host-major order.

    Host-major ordering keeps each host's chips contiguous on the axis, so
    the bulk of ``sort_sharded``'s all-to-all volume rides ICI and only the
    inter-host remainder crosses DCN.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return jax.sharding.Mesh(np.asarray(devs), (axis_name,))


def global_array_from_host_data(
    local_data: np.ndarray, mesh: jax.sharding.Mesh, axis_name: str = "x"
) -> jax.Array:
    """Assemble the global sharded array from this host's shard of keys.

    ``local_data`` is this process's contiguous chunk (equal length on every
    host). The resulting global array is sharded over ``axis_name`` and
    feeds ``sort_sharded`` directly.
    """
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(axis_name)
    )
    return jax.make_array_from_process_local_data(sharding, local_data)
