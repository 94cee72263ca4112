"""Test harness config: run on a virtual 8-device CPU mesh by default.

The reference has no test framework — its example binaries self-verify
against std::sort (SURVEY.md §4). We go further: pytest suites that run
anywhere by forcing the CPU backend with 8 virtual devices, so multi-chip
sharding logic is exercised without a TPU pod (SURVEY.md §4 implication (c)).

Set VKRS_TEST_TPU=1 to run the suite on real TPU hardware instead.
"""

import os

if not os.environ.get("VKRS_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not os.environ.get("VKRS_TEST_TPU"):
    # Must go through jax.config (not the env var): the axon sitecustomize's
    # register() sets jax_platforms="axon,cpu" at interpreter start, which
    # overrides JAX_PLATFORMS from the environment.
    jax.config.update("jax_platforms", "cpu")

# 64-bit keys (uint64/int64/float64, BASELINE.json config #4) require x64.
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)


def make_keys(rng, n, dtype=np.uint32, distribution="uniform28"):
    """Key fixtures mirroring the reference's generators plus the north-star
    extensions: uniform 28-bit (SingleRadixSort.cpp:85-98 caps at 0x0FFFFFFF),
    full-width uniform, descending (the commented-out alternate fixture,
    SingleRadixSort.cpp:96), constant, and Zipf-skewed (BASELINE.json #4).
    """
    dtype = np.dtype(dtype)
    if distribution == "uniform28":
        hi = min(1 << 28, int(np.iinfo(dtype).max)) if dtype.kind == "u" else 1 << 28
        return rng.integers(0, hi, size=n, dtype=dtype if dtype.kind == "u" else np.uint64).astype(dtype)
    if distribution == "uniform":
        if dtype.kind in "ui":
            info = np.iinfo(dtype)
            return rng.integers(info.min, int(info.max), size=n, dtype=dtype)
        return (rng.random(n) * 2 - 1).astype(dtype) * 1e6
    if distribution == "descending":
        return (np.arange(n, 0, -1) % np.iinfo(dtype).max).astype(dtype)
    if distribution == "constant":
        return np.full(n, 42, dtype=dtype)
    if distribution == "zipf":
        raw = rng.zipf(1.3, size=n).astype(np.uint64)
        mod = np.uint64(np.iinfo(dtype).max) if dtype.kind == "u" else np.uint64(1 << 30)
        return (raw % mod).astype(dtype)
    raise ValueError(distribution)
