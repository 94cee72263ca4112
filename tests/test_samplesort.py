"""Sample-sort pipeline (ops/samplesort.py): splitter math, run balancing,
and end-to-end exactness in Pallas interpret mode across the reference's
fixture distributions (SURVEY.md §4) plus the skew configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vkradixsort_tpu.ops.samplesort import (
    _bucket_starts,
    _pick_geometry,
    _splitters,
    sort_samplesort,
)
from tests.conftest import make_keys

INTERPRET = jax.default_backend() != "tpu"
# small tiles so the multi-tile / multi-bucket machinery is exercised
SMALL = dict(tile_target=1 << 16, bucket_target=1 << 15, interpret=INTERPRET)


@pytest.mark.parametrize(
    "distribution", ["uniform", "uniform28", "descending", "constant", "zipf"]
)
def test_samplesort_exact_u32(rng, distribution):
    k = make_keys(rng, 200_000, np.uint32, distribution)
    out = np.asarray(sort_samplesort(jnp.asarray(k), **SMALL))
    np.testing.assert_array_equal(out, np.sort(k))


@pytest.mark.parametrize("n", [70_001, 131072, 131073])
def test_samplesort_ragged_sizes(rng, n):
    k = make_keys(rng, n, np.uint32, "uniform")
    out = np.asarray(sort_samplesort(jnp.asarray(k), **SMALL))
    np.testing.assert_array_equal(out, np.sort(k))


def test_samplesort_u64(rng):
    k = make_keys(rng, 100_000, np.uint64, "uniform")
    out = np.asarray(sort_samplesort(jnp.asarray(k), **SMALL))
    np.testing.assert_array_equal(out, np.sort(k))


def test_samplesort_sentinel_keys(rng):
    """Keys equal to the sentinel (dtype max) must survive exactly."""
    k = make_keys(rng, 65_536, np.uint32, "uniform")
    k[:100] = np.uint32(0xFFFFFFFF)
    out = np.asarray(sort_samplesort(jnp.asarray(k), **SMALL))
    np.testing.assert_array_equal(out, np.sort(k))


def test_samplesort_overflow_fallback(rng):
    """With oversample=1 and tiny slack, skewed input can overflow a bucket;
    the cond fallback must still return the exact sort."""
    k = make_keys(rng, 100_000, np.uint32, "zipf")
    out = np.asarray(
        sort_samplesort(
            jnp.asarray(k),
            tile_target=1 << 16,
            bucket_target=1 << 13,
            oversample=1,
            slack=1.01,
            interpret=INTERPRET,
        )
    )
    np.testing.assert_array_equal(out, np.sort(k))


def test_bucket_starts_balances_equal_runs():
    """A constant row must spread evenly across buckets, not overflow one."""
    row = jnp.full((1, 1024), 7, jnp.uint32)
    spl = jnp.full((7,), 7, jnp.uint32)  # 8 buckets, splitters inside the run
    starts, lens, overflow = _bucket_starts(row, spl, cap=256)
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(lens)[0], np.full(8, 128))


def test_bucket_starts_monotone(rng):
    k = np.sort(make_keys(rng, 4096, np.uint32, "zipf")).reshape(2, 2048)
    rows = jnp.asarray(k)
    spl = _splitters(rows, B=16, oversample=4)
    starts, lens, _ = _bucket_starts(rows, spl, cap=4096)
    s = np.asarray(starts)
    assert (np.diff(s, axis=1) >= 0).all()
    assert (np.asarray(lens) >= 0).all()


def test_pick_geometry_shapes():
    G, C, B, cap = _pick_geometry(100_000_000, 1 << 21, 1 << 20, 1.35)
    assert G * C >= 100_000_000
    assert C % 128 == 0 and cap % 128 == 0 and cap <= C
    assert 8 <= B <= 128
    # slot capacity must cover an even spread with slack
    assert cap * B >= C


@pytest.mark.parametrize("distribution", ["uniform", "zipf", "constant"])
def test_samplesort_pairs_stable(rng, distribution):
    from vkradixsort_tpu.ops.samplesort import sort_pairs_samplesort

    k = make_keys(rng, 120_000, np.uint32, distribution) % 997  # heavy ties
    v = np.arange(1, k.size + 1, dtype=np.uint32)
    ok, ov, overflow = sort_pairs_samplesort(
        jnp.asarray(k), jnp.asarray(v), tile_target=1 << 15,
        bucket_target=1 << 14, interpret=INTERPRET, _debug_overflow=True,
    )
    # the PIPELINE (not the flat fallback) must handle ties/skew: the
    # strided interleave spreads tie runs evenly across rows
    assert not bool(overflow), "kv pipeline fell back — interleave regressed"
    perm = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), k[perm])
    np.testing.assert_array_equal(np.asarray(ov), v[perm])


def test_samplesort_pairs_sentinel_keys(rng):
    from vkradixsort_tpu.ops.samplesort import sort_pairs_samplesort

    k = make_keys(rng, 65_536, np.uint32, "uniform")
    k[::9] = np.uint32(0xFFFFFFFF)
    v = np.arange(1, k.size + 1, dtype=np.uint32)
    ok, ov = sort_pairs_samplesort(
        jnp.asarray(k), jnp.asarray(v), tile_target=1 << 15,
        bucket_target=1 << 14, interpret=INTERPRET,
    )
    perm = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), k[perm])
    np.testing.assert_array_equal(np.asarray(ov), v[perm])


def test_samplesort_pairs_overflow_fallback(rng):
    from vkradixsort_tpu.ops.samplesort import sort_pairs_samplesort

    k = make_keys(rng, 60_000, np.uint32, "zipf")
    v = np.arange(k.size, dtype=np.uint32)
    ok, ov = sort_pairs_samplesort(
        jnp.asarray(k), jnp.asarray(v), tile_target=1 << 14,
        bucket_target=1 << 12, oversample=1, slack=1.01, interpret=INTERPRET,
    )
    perm = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), k[perm])
    np.testing.assert_array_equal(np.asarray(ov), perm.astype(np.uint32))
