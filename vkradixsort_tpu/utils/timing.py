"""Device timing that survives the axon tunnel's ~150 ms host RTT.

The reference times GPU work as wall-clock around submit->vkQueueWaitIdle
(reference singleradixsort/src/SingleRadixSort.cpp:26-31). Here a host
round-trip costs ~150 ms over the tunnel, so per-call host timing is useless.
Instead we chain ``reps`` applications of the function inside ONE jitted
computation (each iteration data-depends on the previous via a cheap bijective
remix so XLA cannot hoist or batch them, and so a sort isn't re-timed on
already-sorted input), fetch a single scalar, and subtract the measured cost
of the remix-only chain.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _remix(x: jnp.ndarray) -> jnp.ndarray:
    """Cheap bijective uint hash (splitmix-style) to re-randomize keys."""
    if x.dtype == jnp.uint32:
        x = x ^ (x >> np.uint32(16))
        x = x * np.uint32(0x7FEB352D)
        x = x ^ (x >> np.uint32(15))
        return x
    x = x ^ (x >> np.uint64(30))
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x = x ^ (x >> np.uint64(27))
    return x


def _chain(f: Callable, reps: int):
    def chained(x):
        def body(_, carry):
            return _remix(f(carry))

        out = jax.lax.fori_loop(0, reps, body, x)
        return out.reshape(-1)[0]

    return jax.jit(chained)


def _time_once(fn, x, trials: int = 3) -> float:
    r = fn(x)
    _ = np.asarray(r)  # warm-up: forces compile + completion, fetches ONE scalar
    best = float("inf")
    for _t in range(trials):
        t0 = time.perf_counter()
        r = fn(x)
        _ = np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_seconds_per_call(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    reps: int = 8,
    min_window: float = 0.25,
) -> float:
    """Mean seconds per f(x) call, net of loop/remix/RTT overhead.

    ``f`` must map a uint array to a same-shaped uint array (e.g. a key sort).
    Grows ``reps`` geometrically until the timed window is long enough to
    stand clear of tunnel RTT jitter (~10 ms).
    """
    t_base = _time_once(_chain(lambda y: y, reps), x)
    while True:
        t_full = _time_once(_chain(f, reps), x)
        # min_window <= 0 disables adaptive growth (CPU-interpret dry runs:
        # each growth step would recompile a longer chain, and a ~0 or
        # negative diff would otherwise grow forever)
        if t_full - t_base > min_window or reps >= 4096 or min_window <= 0:
            return max((t_full - t_base) / reps, 1e-9)
        scale = max(2, int(min_window / max(t_full - t_base, 1e-3)))
        reps = min(reps * scale, 4096)
        t_base = _time_once(_chain(lambda y: y, reps), x)


def measure_pairs_seconds_per_call(
    f: Callable[[jnp.ndarray, jnp.ndarray], tuple],
    keys: jnp.ndarray,
    values: jnp.ndarray,
    reps: int = 8,
    min_window: float = 0.25,
) -> float:
    """Like measure_seconds_per_call for key-value sorts.

    ``values`` may be a single array or any pytree of payload arrays (the
    multi-payload sweeps time tuples). Grows ``reps`` geometrically until
    the timed window stands clear of the tunnel RTT jitter, exactly like
    the keys-only variant — without this, sub-millisecond sorts measure
    as ~0.
    """

    def make(fn_body, reps):
        def chained(k, v):
            out = jax.lax.fori_loop(0, reps, fn_body, (k, v))
            # one forcing scalar regardless of payload tree shape/dtypes
            acc = out[0].reshape(-1)[0].astype(jnp.float32)
            for leaf in jax.tree.leaves(out[1]):
                acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
            return acc

        return jax.jit(chained)

    def full_body(_, carry):
        ck, cv = carry
        ok, ov = f(ck, cv)
        return (_remix(ok), ov)

    def base_body(_, carry):
        ck, cv = carry
        return (_remix(ck), cv)

    def run(fn):
        r = fn(keys, values)
        _ = np.asarray(r)
        best = float("inf")
        for _t in range(2):
            t0 = time.perf_counter()
            r = fn(keys, values)
            _ = np.asarray(r)
            best = min(best, time.perf_counter() - t0)
        return best

    while True:
        t_full = run(make(full_body, reps))
        t_base = run(make(base_body, reps))
        if t_full - t_base > min_window or reps >= 4096 or min_window <= 0:
            return max((t_full - t_base) / reps, 1e-9)
        scale = max(2, int(min_window / max(t_full - t_base, 1e-3)))
        reps = min(reps * scale, 4096)
