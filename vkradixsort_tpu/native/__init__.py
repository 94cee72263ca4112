"""Native (C++) host runtime — ctypes bindings with an on-demand g++ build.

The reference's host side is entirely C++ (engine/ + orchestrators, SURVEY.md
§2 rows 4-12). The TPU compute path needs none of that (PJRT owns the
device), so the native layer here covers the pieces that genuinely run on the
host and are hot at north-star scale:

  * fixture generation (mt19937, reference SingleRadixSort.cpp:85-98),
  * CPU oracle sorts: std::sort plus a multi-threaded stable LSD radix
    sort/argsort (the reference's std::sort baseline is the verification
    bottleneck at 1e8 keys),
  * exact element-wise verification (reference SingleRadixSort.cpp:113-126).

The shared library is compiled once per machine into a cache dir and loaded
with ctypes. Every entry point has a numpy fallback so the package works
without a toolchain (``native.available()`` reports which one is active).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile

import numpy as np

_SRC = pathlib.Path(__file__).with_name("host_runtime.cpp")
_LIB = None
_LIB_ERR = None


def _cache_dir() -> pathlib.Path:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = pathlib.Path(base) / "vkradixsort_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build() -> pathlib.Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"host_runtime_{tag}.so"
    if out.exists():
        return out
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td) / out.name
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3",
            "-std=c++17",
            "-shared",
            "-fPIC",
            "-pthread",
            str(_SRC),
            "-o",
            str(tmp),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)  # atomic: concurrent builders race benignly
    return out


def _load():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    if os.environ.get("VKRS_NO_NATIVE"):
        _LIB_ERR = RuntimeError("disabled via VKRS_NO_NATIVE")
        return None
    try:
        lib = ctypes.CDLL(str(_build()))
    except Exception as e:  # toolchain missing, build error, load error
        _LIB_ERR = e
        return None

    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    st = ctypes.c_size_t
    sigs = {
        "vkrs_generate_u32": (None, [ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32, u32p, st]),
        "vkrs_generate_u64": (None, [ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, u64p, st]),
        "vkrs_generate_descending_u32": (None, [u32p, st]),
        "vkrs_std_sort_u32": (None, [u32p, st]),
        "vkrs_std_sort_u64": (None, [u64p, st]),
        "vkrs_radix_sort_u32": (None, [u32p, st]),
        "vkrs_radix_sort_u64": (None, [u64p, st]),
        "vkrs_radix_sort_kv_u32": (None, [u32p, u32p, st]),
        "vkrs_radix_sort_kv_u64": (None, [u64p, u64p, st]),
        "vkrs_stable_argsort_u32": (None, [u32p, u32p, st]),
        "vkrs_first_mismatch_u32": (ctypes.c_int64, [u32p, u32p, st]),
        "vkrs_first_mismatch_u64": (ctypes.c_int64, [u64p, u64p, st]),
        "vkrs_first_unsorted_u32": (ctypes.c_int64, [u32p, st]),
        "vkrs_abi_version": (ctypes.c_int, []),
    }
    for name, (res, args) in sigs.items():
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = args
    assert lib.vkrs_abi_version() == 1
    _LIB = lib
    return lib


def available() -> bool:
    """True if the compiled native library is loaded (vs numpy fallback)."""
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


# ---- public API (numpy in, numpy out; native when available) ----


def generate_uniform(seed: int, n: int, lo: int = 0, hi: int = 0x0FFFFFFF,
                     dtype=np.uint32) -> np.ndarray:
    """Uniform keys in [lo, hi] — the reference's fixture distribution
    (SingleRadixSort.cpp:85-98 caps u32 values at 0x0FFFFFFF)."""
    dtype = np.dtype(dtype)
    lib = _load()
    out = np.empty(n, dtype)
    if lib is not None and dtype == np.uint32:
        lib.vkrs_generate_u32(seed, lo, hi, _ptr(out, ctypes.c_uint32), n)
        return out
    if lib is not None and dtype == np.uint64:
        lib.vkrs_generate_u64(seed, lo, hi, _ptr(out, ctypes.c_uint64), n)
        return out
    rng = np.random.default_rng(seed)
    return rng.integers(lo, int(hi) + 1, size=n, dtype=dtype)


def generate_descending(n: int) -> np.ndarray:
    """The reference's commented-out descending fixture
    (SingleRadixSort.cpp:96: ``numElements - i``)."""
    lib = _load()
    out = np.empty(n, np.uint32)
    if lib is not None:
        lib.vkrs_generate_descending_u32(_ptr(out, ctypes.c_uint32), n)
        return out
    return (n - np.arange(n, dtype=np.int64)).astype(np.uint32)


def oracle_sort(keys: np.ndarray, algorithm: str = "radix") -> np.ndarray:
    """CPU oracle sort (copy; input untouched).

    algorithm='std' uses std::sort exactly like the reference baseline
    (SingleRadixSort.cpp:106-111); 'radix' uses the multi-threaded LSD
    radix sort (identical output, much faster at 1e8).
    """
    lib = _load()
    out = np.ascontiguousarray(keys).copy()
    if lib is None:
        out.sort(kind="stable")
        return out
    n = out.size
    if out.dtype == np.uint32:
        fn = lib.vkrs_std_sort_u32 if algorithm == "std" else lib.vkrs_radix_sort_u32
        fn(_ptr(out, ctypes.c_uint32), n)
    elif out.dtype == np.uint64:
        fn = lib.vkrs_std_sort_u64 if algorithm == "std" else lib.vkrs_radix_sort_u64
        fn(_ptr(out, ctypes.c_uint64), n)
    else:
        out.sort(kind="stable")
    return out


def oracle_argsort(keys: np.ndarray) -> np.ndarray:
    """Stable argsort oracle (uint32 indices; requires n < 2^32)."""
    lib = _load()
    keys = np.ascontiguousarray(keys)
    if lib is not None and keys.dtype == np.uint32:
        idx = np.empty(keys.size, np.uint32)
        lib.vkrs_stable_argsort_u32(
            _ptr(keys, ctypes.c_uint32), _ptr(idx, ctypes.c_uint32), keys.size
        )
        return idx
    return np.argsort(keys, kind="stable").astype(np.uint32)


def first_mismatch(a: np.ndarray, b: np.ndarray) -> int:
    """First index where a != b, or -1 — the reference's testSort check
    (SingleRadixSort.cpp:113-126) as a fast primitive."""
    assert a.shape == b.shape and a.dtype == b.dtype
    lib = _load()
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b)
    if lib is not None and a.dtype == np.uint32:
        return int(lib.vkrs_first_mismatch_u32(
            _ptr(a, ctypes.c_uint32), _ptr(b, ctypes.c_uint32), a.size))
    if lib is not None and a.dtype == np.uint64:
        return int(lib.vkrs_first_mismatch_u64(
            _ptr(a, ctypes.c_uint64), _ptr(b, ctypes.c_uint64), a.size))
    neq = np.nonzero(a != b)[0]
    return int(neq[0]) if neq.size else -1


def first_unsorted(a: np.ndarray) -> int:
    """First index i with a[i] > a[i+1], or -1 if non-decreasing."""
    lib = _load()
    a = np.ascontiguousarray(a)
    if lib is not None and a.dtype == np.uint32:
        return int(lib.vkrs_first_unsorted_u32(_ptr(a, ctypes.c_uint32), a.size))
    bad = np.nonzero(a[:-1] > a[1:])[0]
    return int(bad[0]) if bad.size else -1
