"""Native C++ host runtime: generation, oracle sorts, verification.

Mirrors what the reference's host layer does in C++ (generateRandomNumbers,
std::sort baseline, testSort verify — SingleRadixSort.cpp:85-126) and checks
the ctypes bindings agree bitwise with numpy. Skips gracefully if no
toolchain is present (the numpy fallbacks are then exercised instead).
"""

import numpy as np
import pytest

from vkradixsort_tpu import native


def test_generate_uniform_range_and_determinism():
    a = native.generate_uniform(7, 100_000)
    b = native.generate_uniform(7, 100_000)
    c = native.generate_uniform(8, 100_000)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.dtype == np.uint32
    # reference distribution caps at 0x0FFFFFFF (SingleRadixSort.cpp:89)
    assert a.max() <= 0x0FFFFFFF


def test_generate_uniform_u64():
    a = native.generate_uniform(3, 10_000, hi=0x0FFFFFFFFFFF, dtype=np.uint64)
    assert a.dtype == np.uint64
    assert a.max() <= 0x0FFFFFFFFFFF


def test_generate_descending():
    d = native.generate_descending(1000)
    assert d[0] == 1000 and d[-1] == 1
    assert native.first_unsorted(d[::-1].copy()) == -1


@pytest.mark.parametrize("algorithm", ["std", "radix"])
@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_oracle_sort_matches_numpy(rng, algorithm, dtype):
    k = rng.integers(0, np.iinfo(dtype).max, size=50_000, dtype=dtype)
    out = native.oracle_sort(k, algorithm)
    np.testing.assert_array_equal(out, np.sort(k))
    # input untouched
    assert not np.array_equal(k, out) or np.array_equal(k, np.sort(k))


def test_oracle_argsort_stable(rng):
    k = (rng.integers(0, 64, size=30_000)).astype(np.uint32)  # heavy ties
    idx = native.oracle_argsort(k)
    np.testing.assert_array_equal(idx, np.argsort(k, kind="stable"))


def test_first_mismatch():
    a = np.arange(1000, dtype=np.uint32)
    b = a.copy()
    assert native.first_mismatch(a, b) == -1
    b[123] += 1
    assert native.first_mismatch(a, b) == 123
    b64 = a.astype(np.uint64)
    c64 = b64.copy()
    c64[999] ^= 1
    assert native.first_mismatch(b64, c64) == 999


def test_first_unsorted():
    a = np.arange(1000, dtype=np.uint32)
    assert native.first_unsorted(a) == -1
    a[500] = 0
    assert native.first_unsorted(a) == 499
    assert native.first_unsorted(np.empty(0, np.uint32)) == -1
    assert native.first_unsorted(np.zeros(1, np.uint32)) == -1
