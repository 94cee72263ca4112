"""Sort configuration — the analog of the reference's three config tiers.

The reference configures via shader ``#define``s (WORKGROUP_SIZE=256,
RADIX_SORT_BINS=256, ITERATIONS — single_radixsort.comp:10-14), host
compile-time constants (SORT_32BIT / SORT_64_BIT, NUM_BLOCKS_PER_WORKGROUP —
SingleRadixSort.h:10-18, MultiRadixSort.cpp:12) and runtime push constants
(multi_radixsort.comp:17-22). On TPU all of these become static Python
config specialized at trace time (SURVEY.md §5 "Config / flag system").

Every field here has a consumer in ops/dispatch.py; engine-specific tuned
defaults (samplesort's kv tile, merge's VMEM-derived tile_rows) apply when
the corresponding knob is left at its default.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SortConfig:
    """Static knobs for the sort pipelines.

    Attributes:
      fused_max_n: largest N accepted by the fused in-VMEM matmul-radix
        kernel when explicitly selected (``backend="fused"``) — the analog
        of the reference's single-regime size bound (README.md:18-21).
        Above this the kernel's quadratic matmul-scatter cost and compile
        time are prohibitive; dispatch raises rather than compiling for
        minutes.
      chunk: elements per grid step of the radix_tiled pipeline's
        destination kernel — the range one MXU one-hot rank computation
        covers. Power of two, multiple of 128.
      tile: grain-size override, in elements per tile — the analog of the
        reference's NUM_BLOCKS_PER_WORKGROUP * WORKGROUP_SIZE knob
        (reference MultiRadixSort.cpp:12-17). ``None`` (default) keeps each
        engine's measured-optimal default (samplesort: 2^19 keys-only /
        2^21 kv; merge: VMEM-derived tile_rows). When set, samplesort uses
        it as tile/bucket target and merge derives its VMEM tile from it.
      interpret: run Pallas kernels in interpreter mode (the validation-
        layer analog, SURVEY.md §5 "race detection").
    """

    fused_max_n: int = 1 << 15
    chunk: int = 2048
    tile: int | None = None
    interpret: bool = False

    def replace(self, **kw) -> "SortConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = SortConfig()


# Per-N grain tuning table — the analog of the reference's published
# NBPW-sweep optima (reference README.md:253-283 sweeps NBPW at each of
# seven sizes and reads off the sweet spot). Measured with
# benchmarks/grain_sweep.py on v5e (CSVs in benchmarks/results/); the
# dispatcher consults this whenever ``SortConfig.tile`` is left None.
#
# engine -> op ("keys" | "kv") -> list of (max_n, elements_per_tile),
# scanned in order; first row with n <= max_n wins.
GRAIN_TABLE: dict = {
    "samplesort": {
        # v5e_samplesort_grain_1e8.csv: keys-only optimum 2^19 at 1e8;
        # kv stays 2^21 (3-plane placement is descriptor-bound).
        "keys": [(float("inf"), 1 << 19)],
        "kv": [(float("inf"), 1 << 21)],
    },
    "merge": {
        # G=128 rows (T=2^18) is the engine's analytic VMEM-budget default
        # for one plane (ops/merge._default_tile_rows); kv shrinks with the
        # plane count. Rows here override once benchmarks/grain_sweep.py
        # --engine merge has swept the real chip (CSV lands in
        # benchmarks/results/).
        "keys": [(float("inf"), 128 * 2048)],
        "kv": [(float("inf"), None)],  # None -> engine's VMEM-derived default
        "argsort": [(float("inf"), None)],
    },
}


# Merge-engine tilesort seeding — whether the bitonic network's levels
# 1..log2(2048) are replaced by ONE XLA batched width-2048 segment sort
# (ops/merge._segsort_seed), per op and size. A/B-measured on v5e
# (benchmarks/results/v5e_merge_grain_kv_segseed.csv and the r3b session):
# the XLA pass wins when the tilesort is compute-bound (multi-plane kv),
# rows are (max_n, bool), first row with n <= max_n wins.
SEGSEED_TABLE: dict = {
    "keys": [(float("inf"), False)],
    "kv": [(float("inf"), False)],
    "argsort": [(float("inf"), False)],
}


def segseed_for(op: str, n: int) -> bool:
    """Measured default for the merge engine's XLA tilesort seed at size
    ``n`` (op is "keys" | "kv" | "argsort"). Env VKRS_MERGE_SEGSEED
    overrides at trace time (ops/merge._env_segseed)."""
    for max_n, seg in SEGSEED_TABLE.get(op, []):
        if n <= max_n:
            return bool(seg)
    return False


# Default-routing table — which engine ``backend=None`` picks on TPU, per
# operation and size. The analog of the reference's published single-vs-multi
# regime guidance (reference README.md:11-22: "single for N < ~10k, multi
# beyond"), except measured and machine-applied: rows are (max_n, engine),
# scanned in order, first row with n <= max_n wins. Engines listed here must
# accept arbitrary payload counts/dtypes or the dispatcher falls back to
# "tiled" when the call is outside the engine's envelope (see
# ops/dispatch._route).
ROUTE_TABLE: dict = {
    # Measured on v5e (benchmarks/results/v5e_merge_vs_tiled_keys.csv): the
    # merge engine beats XLA's flat sort at 1e8 u32 keys (148.5 ms vs
    # 178.7 ms, 1.20x) and loses at 1.6e7 and below, so keys cross over at
    # the log-midpoint ~4e7 — the TPU analog of the reference's published
    # single-vs-multi regime split (reference README.md:11-22).
    "keys": [(40_000_000, "tiled"), (float("inf"), "merge")],
    # kv (v5e_merge_vs_tiled_kv.csv): tiled wins at every measured size —
    # 474.6 ms vs 519.8 ms at 1e8 (3-plane stable carry); merge rows land
    # here only if the grain sweep / segseed A/B flip the 1e8 point.
    "kv": [(float("inf"), "tiled")],
    "argsort": [(float("inf"), "tiled")],
    # Local phases of the distributed sort (parallel/distributed.py): "xla"
    # is the composite (key, position) lax.sort; "merge" runs the same total
    # order through ops/merge. n here is the PER-SHARD chunk size. Rows flip
    # to "merge" wherever the real-chip sweep shows the same-total-order
    # local sort winning (its regime is exactly the kv crossover).
    "dist_local": [(float("inf"), "xla")],
}


def route_for(op: str, n: int) -> str:
    """Default engine for ``op`` ("keys" | "kv" | "argsort" | "dist_local")
    at size ``n``."""
    for max_n, eng in ROUTE_TABLE.get(op, []):
        if n <= max_n:
            return eng
    return "tiled"


def grain_for(engine: str, op: str, n: int):
    """Elements-per-tile for ``engine`` sorting ``n`` elements (``op`` is
    "keys" or "kv"). None means the engine's built-in default applies."""
    for max_n, grain in GRAIN_TABLE.get(engine, {}).get(op, []):
        if n <= max_n:
            return grain
    return None
