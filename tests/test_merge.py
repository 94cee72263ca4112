"""Merge-path large-N engine tests (interpret on CPU, real on TPU).

The engine under test is the round-2 flagship (ops/merge.py): in-VMEM
bitonic tile sorts + a run-doubling merge-path ladder — the TPU re-design of
the reference's fastest path (multiradixsort shaders). Small ``tile_rows``
values force many ladder levels so every merge-path branch (window
alignment, run tails, pad tiles, stability carry) is exercised at CPU-suite
sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vkradixsort_tpu as vk
from vkradixsort_tpu.engine.config import SortConfig
from vkradixsort_tpu.ops.merge import sort_merge, sort_merge_planes
from tests.conftest import make_keys

INTERPRET = jax.default_backend() != "tpu"
CFG = SortConfig(interpret=INTERPRET)


# --- plane-level driver -----------------------------------------------------


@pytest.mark.parametrize("n", [0, 1, 100, 4096, 8192, 40_000, 100_001])
def test_planes_keys_multilevel(rng, n):
    # tile_rows=2 -> T=4096: n=100_001 runs a 5-level ladder with a ragged
    # final run, covering empty-B pairs and pad tiles
    keys = rng.integers(-(1 << 31), 1 << 31, size=n, dtype=np.int32)
    keys = np.minimum(keys, np.iinfo(np.int32).max - 1)
    (out,) = sort_merge_planes(
        [jnp.asarray(keys)], 1, tile_rows=2, interpret=INTERPRET
    )
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))


def test_planes_stable_ties(rng):
    # heavy ties + position plane: the ladder must preserve input order
    n = 50_000
    keys = rng.integers(0, 5, size=n).astype(np.int32)
    pos = np.arange(n, dtype=np.int32)
    out_k, out_p = sort_merge_planes(
        [jnp.asarray(keys), jnp.asarray(pos)], 2, tile_rows=2, interpret=INTERPRET
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(out_p), perm.astype(np.int32))


def test_planes_sentinel_valued_keys(rng):
    # keys equal to the int32-max pad sentinel must still sort exactly
    n = 10_000
    keys = rng.integers(0, 3, size=n).astype(np.int32)
    keys[keys == 2] = np.iinfo(np.int32).max
    (out,) = sort_merge_planes(
        [jnp.asarray(keys)], 1, tile_rows=2, interpret=INTERPRET
    )
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))


# --- encoded-key engine entry -----------------------------------------------


@pytest.mark.parametrize("dist", ["uniform", "descending", "constant", "zipf"])
def test_sort_merge_u32(rng, dist):
    keys = make_keys(rng, 30_000, np.uint32, dist)
    out, _ = sort_merge(jnp.asarray(keys), tile_rows=2, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))


def test_sort_merge_u64(rng):
    keys = rng.integers(0, 1 << 64, size=20_000, dtype=np.uint64)
    out, _ = sort_merge(jnp.asarray(keys), tile_rows=2, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))


def test_sort_merge_stable_kv(rng):
    n = 30_000
    keys = rng.integers(0, 64, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    out_k, (out_v,) = sort_merge(
        jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=2, interpret=INTERPRET
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(out_v), perm.astype(np.uint32))


def test_sort_merge_multi_payload_8byte(rng):
    # one 4-byte float payload + one 8-byte payload, both carried exactly
    n = 20_000
    keys = rng.integers(0, 1 << 16, size=n, dtype=np.uint32)
    v32 = rng.standard_normal(n).astype(np.float32)
    v64 = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    out_k, (o32, o64) = sort_merge(
        jnp.asarray(keys),
        (jnp.asarray(v32), jnp.asarray(v64)),
        tile_rows=2,
        interpret=INTERPRET,
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(o32), v32[perm])
    np.testing.assert_array_equal(np.asarray(o64), v64[perm])


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_argsort_merge_stable(rng, dtype):
    # the 2-plane fast path: position plane doubles as carry AND answer
    from vkradixsort_tpu.ops.merge import argsort_merge

    n = 30_000
    # full-range keys (the u64 hi plane must matter) with planted ties
    keys = rng.integers(0, np.iinfo(dtype).max, size=n, dtype=dtype)
    keys[rng.integers(0, n, size=n // 4)] = keys[0]
    perm = argsort_merge(jnp.asarray(keys), tile_rows=2, interpret=INTERPRET)
    np.testing.assert_array_equal(
        np.asarray(perm), np.argsort(keys, kind="stable").astype(np.uint32)
    )


def test_sort_merge_rejects_bad_dtypes(rng):
    with pytest.raises(TypeError):
        sort_merge(jnp.zeros(128, jnp.int32), interpret=INTERPRET)
    with pytest.raises(TypeError):
        sort_merge(
            jnp.zeros(128, jnp.uint32),
            (jnp.zeros(128, jnp.uint8),),
            interpret=INTERPRET,
        )


# --- via the public dispatch API ---------------------------------------------


def test_dispatch_merge_keys(rng):
    keys = make_keys(rng, 300_001, np.uint32, "uniform")
    out = vk.sort(jnp.asarray(keys), backend="merge", config=CFG)
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))


def test_dispatch_merge_float_descending(rng):
    keys = rng.standard_normal(50_000).astype(np.float32)
    out = vk.sort(jnp.asarray(keys), backend="merge", config=CFG, descending=True)
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys)[::-1])


def test_dispatch_merge_argsort(rng):
    keys = make_keys(rng, 50_000, np.uint32, "zipf")
    perm = vk.argsort(jnp.asarray(keys), backend="merge", config=CFG)
    np.testing.assert_array_equal(
        np.asarray(perm), np.argsort(keys, kind="stable").astype(np.uint32)
    )


def test_dispatch_merge_int64_kv(rng):
    n = 40_000
    keys = rng.integers(-(1 << 62), 1 << 62, size=n, dtype=np.int64)
    vals = np.arange(n, dtype=np.uint32)
    out_k, out_v = vk.sort_pairs(
        jnp.asarray(keys), jnp.asarray(vals), backend="merge", config=CFG
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(out_v), perm.astype(np.uint32))


# --- XLA segment-sort tilesort seed (segseed) ---------------------------------


def test_sort_merge_segseed_keys(rng):
    # seeded tilesort (levels 1..log2(C) via one XLA batched sort) must be
    # bitwise-identical to the pure-network path
    keys = make_keys(rng, 30_000, np.uint32, "uniform")
    out, _ = sort_merge(
        jnp.asarray(keys), tile_rows=2, interpret=INTERPRET, segseed=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))


def test_sort_merge_segseed_stable_kv(rng):
    # heavy duplicates: the seed's unstable lax.sort must still yield a
    # STABLE composite because the position plane rides as a compare plane
    n = 30_000
    keys = rng.integers(0, 7, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    out_k, (out_v,) = sort_merge(
        jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=2,
        interpret=INTERPRET, segseed=True,
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(out_v), perm.astype(np.uint32))


@pytest.mark.parametrize("impl", ["stable", "iota", "packed"])
def test_seed_impls_bitwise_identical(rng, impl, monkeypatch):
    # the three stable-seed implementations (is_stable / explicit iota tie
    # plane / packed-u64 comparator) must produce the SAME stable result
    # bitwise — they are priced against each other on hardware
    # (benchmarks/seed_probe.py) and the default ships the cheapest
    monkeypatch.setenv("VKRS_MERGE_SEED_IMPL", impl)
    n = 30_000
    keys = rng.integers(0, 7, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    out_k, (out_v,) = sort_merge(
        jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=2,
        interpret=INTERPRET, segseed=4096,
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(out_v), perm.astype(np.uint32))


def test_seed_impl_packed_rejects_wide_keys(rng, monkeypatch):
    # u64 keys ride two compare planes; the packed seed has no room for
    # them in its u64 comparator and must refuse loudly rather than sort
    # by the high plane only
    monkeypatch.setenv("VKRS_MERGE_SEED_IMPL", "packed")
    n = 20_000
    keys = rng.integers(0, 7, size=n, dtype=np.uint64)
    vals = np.arange(n, dtype=np.uint32)
    with pytest.raises(ValueError, match="packed"):
        sort_merge(
            jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=2,
            interpret=INTERPRET, segseed=4096,
        )


def test_seed_impl_iota_wide_keys_stable(rng, monkeypatch):
    # the iota tie plane composes with multi-plane (u64) compare keys
    monkeypatch.setenv("VKRS_MERGE_SEED_IMPL", "iota")
    n = 20_000
    keys = rng.integers(0, 7, size=n, dtype=np.uint64)
    vals = np.arange(n, dtype=np.uint32)
    out_k, (out_v,) = sort_merge(
        jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=2,
        interpret=INTERPRET, segseed=4096,
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(out_v), perm.astype(np.uint32))


def test_midstage_hatch_bitwise_identical(rng, monkeypatch):
    # VKRS_MERGE_MIDSTAGE=1 swaps the granule-aligned lane stages
    # (d=128..1024) for reshape-based mid stages (merge._mid_stage) in
    # every network level; the schedule is a measured NEGATIVE on v5e
    # (BENCHMARKS.md per-stage model) but stays as a recorded A/B and must
    # remain bitwise-identical to the default roll schedule — tie-heavy
    # stable kv exercises the syn_tie plane through the mid stages too
    monkeypatch.setenv("VKRS_MERGE_MIDSTAGE", "1")
    n = 30_000
    keys = rng.integers(0, 7, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    out_k, (out_v,) = sort_merge(
        jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=2,
        interpret=INTERPRET, segseed=True,
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(out_v), perm.astype(np.uint32))


def test_argsort_merge_segseed(rng):
    from vkradixsort_tpu.ops.merge import argsort_merge

    n = 30_000
    keys = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    keys[rng.integers(0, n, size=n // 4)] = keys[0]
    perm = argsort_merge(
        jnp.asarray(keys), tile_rows=2, interpret=INTERPRET, segseed=True
    )
    np.testing.assert_array_equal(
        np.asarray(perm), np.argsort(keys, kind="stable").astype(np.uint32)
    )


def test_segseed_env_overrides_argument(rng, monkeypatch):
    # VKRS_MERGE_SEGSEED=0 forces the seed OFF even when the caller (or the
    # dispatcher's SEGSEED_TABLE default) asks for it — the A/B scripts in
    # benchmarks/ rely on exactly this precedence. A spy on _segsort_seed
    # records whether the seed path actually ran (the sorted output alone
    # is identical either way, so it cannot witness the precedence).
    from vkradixsort_tpu.ops import merge as merge_mod

    calls = []
    real_seed = merge_mod._segsort_seed

    def spy(planes, nck, width=None, stable=False):
        calls.append(width)
        return real_seed(planes, nck, width=width, stable=stable)

    monkeypatch.setattr(merge_mod, "_segsort_seed", spy)
    keys = make_keys(rng, 10_000, np.uint32, "zipf")
    monkeypatch.setenv("VKRS_MERGE_SEGSEED", "0")
    out0, _ = sort_merge(
        jnp.asarray(keys), tile_rows=2, interpret=INTERPRET, segseed=True
    )
    assert calls == [], "env=0 must suppress the seed the argument asked for"
    monkeypatch.setenv("VKRS_MERGE_SEGSEED", "1")
    out1, _ = sort_merge(
        jnp.asarray(keys), tile_rows=2, interpret=INTERPRET, segseed=False
    )
    assert len(calls) == 1, "env=1 must run the seed the argument declined"
    np.testing.assert_array_equal(np.asarray(out0), np.sort(keys))
    np.testing.assert_array_equal(np.asarray(out1), np.sort(keys))


def test_segseed_env_rejects_bad_values(monkeypatch):
    from vkradixsort_tpu.ops.merge import _env_segseed

    for bad in ("yes", "2", "3000", "1.5"):
        monkeypatch.setenv("VKRS_MERGE_SEGSEED", bad)
        with pytest.raises(ValueError):
            _env_segseed(False)
    monkeypatch.setenv("VKRS_MERGE_SEGSEED", "4096")
    assert _env_segseed(False) == 4096
    monkeypatch.setenv("VKRS_MERGE_SEGSEED", "1")
    assert _env_segseed(False) is True


@pytest.mark.parametrize("width", [4096, 8192])
def test_sort_merge_segseed_width(rng, width):
    # wider-than-C seeds (segseed=<int>) replace more network levels; at
    # width == T the Pallas tilesort is skipped entirely — both must stay
    # bitwise-exact and stable
    n = 40_000
    keys = rng.integers(0, 13, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    out_k, (out_v,) = sort_merge(
        jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=4,
        interpret=INTERPRET, segseed=width,
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(out_v), perm.astype(np.uint32))


# --- synthetic tie-break (syn_tie): stable kv at 2-plane HBM cost ----------


@pytest.mark.parametrize("n", [1, 2, 5000, 100_001])
@pytest.mark.parametrize("seed", [False, True, 4096])
def test_syn_tie_stable_kv_tie_heavy(rng, n, seed):
    # stable=True now synthesizes the tie-break in VMEM (no position plane
    # through HBM — merge.sort_merge_planes syn_tie). Keys from a tiny
    # domain make nearly every element a tie, so any tie-order error is
    # caught; seed=4096 == T skips the Pallas tilesort entirely (the seed
    # must then be the STABLE batched sort + odd-tile reverse).
    keys = rng.integers(0, 8, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    out_k, (out_v,) = sort_merge(
        jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=2,
        interpret=INTERPRET, segseed=seed,
    )
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[perm])
    np.testing.assert_array_equal(np.asarray(out_v), perm.astype(np.uint32))


def test_syn_tie_planes_two_compare_planes(rng):
    # plane-level: lexicographic (hi, lo) compare + syn tie-break + carry —
    # the u64-key stable-kv geometry (3 HBM planes instead of 4)
    n = 50_000
    hi = rng.integers(0, 4, size=n).astype(np.int32)
    lo = rng.integers(0, 4, size=n).astype(np.int32)
    val = np.arange(n, dtype=np.int32)
    out = sort_merge_planes(
        [jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(val)], 2,
        tile_rows=2, interpret=INTERPRET, syn_tie=True, segseed=True,
    )
    perm = np.lexsort((lo, hi))  # np.lexsort is stable
    np.testing.assert_array_equal(np.asarray(out[0]), hi[perm])
    np.testing.assert_array_equal(np.asarray(out[1]), lo[perm])
    np.testing.assert_array_equal(np.asarray(out[2]), val[perm])


def test_stable_pos_env_hatch(rng, monkeypatch):
    # VKRS_MERGE_STABLE_POS=1 restores the round-3 carried-position-plane
    # composite (the A/B baseline). Both modes must agree bitwise; a spy on
    # sort_merge_planes proves the hatch actually adds the HBM plane.
    from vkradixsort_tpu.ops import merge as merge_mod

    seen = []
    real = merge_mod.sort_merge_planes

    def spy(planes, nck, **kw):
        seen.append((len(planes), nck, kw.get("syn_tie", False)))
        return real(planes, nck, **kw)

    monkeypatch.setattr(merge_mod, "sort_merge_planes", spy)
    n = 20_000
    keys = rng.integers(0, 16, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    out_syn = sort_merge(
        jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=2, interpret=INTERPRET
    )
    monkeypatch.setenv("VKRS_MERGE_STABLE_POS", "1")
    out_pos = sort_merge(
        jnp.asarray(keys), (jnp.asarray(vals),), tile_rows=2, interpret=INTERPRET
    )
    assert seen == [(2, 1, True), (3, 2, False)], seen
    np.testing.assert_array_equal(np.asarray(out_syn[0]), np.asarray(out_pos[0]))
    np.testing.assert_array_equal(
        np.asarray(out_syn[1][0]), np.asarray(out_pos[1][0])
    )
