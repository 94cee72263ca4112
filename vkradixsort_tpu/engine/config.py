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
        # Swept on v5e (benchmarks/results/v5e_merge_grain*.csv, all points
        # exactness-verified): keys valley is 2^15..2^16 at 1e6 (1.11 ms),
        # 2^17 at 1e7 (13.22 ms) and at 1e8 (142.26 ms with the segseed,
        # 150.42 without). The r5 per-size study confirmed 2^17 at the
        # newly-routed mid sizes: keys 2e7 24.3 ms at 2^17 vs 25.9 at 2^16,
        # 4e7 53.1 vs 56.9 (v5e_keys_mid_grain.csv). kv under syn_tie: the
        # grain x seed surface at 1e8 is FLAT across 2^16-2^17 (384.3-388.5
        # ms, v5e_kv_syn_grainseed.csv; 2^18 cliff to 461-474), so 2^17
        # stands. argsort follows keys+pos (v5e_argsort_seg17.csv: 338.4 ms
        # at 2^17 seeded).
        "keys": [(2_000_000, 1 << 15), (float("inf"), 1 << 17)],
        "kv": [(float("inf"), 1 << 17)],
        "argsort": [(float("inf"), 1 << 17)],
    },
}


# Merge-engine tilesort seeding — whether the bitonic network's levels
# 1..log2(width) are replaced by ONE XLA batched segment sort
# (ops/merge._segsort_seed), per op and size. A/B-measured on v5e at 1e8,
# grain 2^17 (benchmarks/results/v5e_merge_grain{,_kv}_segseed.csv, all
# exactness-verified): the seed wins at 1e8 for every op — keys 142.26 ms
# seeded vs 150.42 unseeded, kv 449.71 vs 474.23 (2^16 unseeded optimum),
# argsort 338.4 seeded vs 340.6 on tiled. Below ~4e7 the merge engine is
# not routed implicitly, so smaller rows stay at the unseeded default
# pending measurement. Rows are (max_n, bool|int width), first row with
# n <= max_n wins.
# Width optima from the r4b sweep (v5e_{kv,keys,argsort,u64}_seedwidth.csv,
# all exact at 1e8, grain 2^17): kv 425.5-425.7 ms at 16384/32768 (vs 449.7
# at 2048, cliff to 497.4 at 65536); keys 139.1 ms at 8192 (142.26 at 2048,
# 140.8 at 32768); argsort 319.0 ms at 16384 (338.4 at 2048); u64 keys
# 319.9 ms at 16384 (340.4 at 2048).
# Thresholds align with ROUTE_TABLE so every implicitly-routed merge call
# runs the exact seeded configuration that was measured and exactness-
# verified at its size.
SEGSEED_TABLE: dict = {
    "keys": [(16_000_000, False), (float("inf"), 8192)],
    # keys64 width 32768: ties 16384 on uniform at 1e8 (319.1 vs 319.9 ms,
    # v5e_u64_seedwidth.csv) and wins Zipf by 6% (319.3 vs 339.2,
    # v5e_u64_zipf_seedwidth.csv) — the skew-aware pick that closed the r4
    # u64-Zipf tie (merge 319.3 vs tiled 339.7).
    # boundary tracks the 2e7 route flip: the r5 bracket points (2e7, 4e7)
    # were measured seeded at 32768 (v5e_u64_keys_crossover_r5.csv)
    "keys64": [(20_000_000, False), (float("inf"), 32768)],
    # kv boundary tracks the r5 syn_tie route flip (~9e6): the 1e7 and
    # 1.5e7 crossover points were measured seeded at 16384
    # (v5e_kv_syn_crossover.csv), and the r5 width matrix re-confirmed
    # 16384 at 1e8 under syn_tie (384.3-384.5 ms vs 388.0 at 8192 and
    # 385.1 at 32768, v5e_kv_syn_grainseed.csv).
    "kv": [(9_000_000, False), (float("inf"), 16384)],
    # kv64 routes merge from ~1e6 (ROUTE_TABLE) and every r5 bracket point
    # (5e5..1e8, v5e_kv64_syn_crossover.csv) was measured seeded at 16384,
    # so the row seeds at every routed size.
    "kv64": [(float("inf"), 16384)],
    "argsort": [(30_000_000, False), (float("inf"), 16384)],
}


def _op_rows(table: dict, op: str, wide: bool):
    """Rows for ``op``, preferring the 64-bit-key specialization ("keys64",
    "kv64", ...) when one is measured — wide keys ride TWO lexicographic
    compare planes through the merge engine, so their optima and crossovers
    differ from the 32-bit rows (e.g. the u64-key kv crossover sits far
    below the u32 one: v5e_kv_u64keys.csv shows merge 1.92x at 1e8)."""
    if wide:
        rows = table.get(op + "64")
        if rows is not None:
            return rows
    return table.get(op, [])


def segseed_for(op: str, n: int, wide: bool = False):
    """Measured default for the merge engine's XLA tilesort seed at size
    ``n`` (op is "keys" | "kv" | "argsort"; ``wide`` selects the 64-bit-key
    rows): False/True, or an int seed width (a power of two > 2048 —
    ops/merge._segsort_seed). Env VKRS_MERGE_SEGSEED overrides at trace
    time (ops/merge._env_segseed)."""
    for max_n, seg in _op_rows(SEGSEED_TABLE, op, wide):
        if n <= max_n:
            return seg
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
    # Measured on v5e: at the swept config (grain 2^17, seed width 8192)
    # the merge engine beats XLA's flat sort from 2e7 up — 24.3 vs 29.2 ms
    # at 2e7, 53.1 vs 66.0 at 4e7 (v5e_keys_crossover_w8192.csv), 139.1 vs
    # 178.7 at 1e8 (v5e_keys_seedwidth.csv) — and tiled won the last point
    # measured below (1.6e7: 17.5 vs 20.5, v5e_merge_vs_tiled_keys.csv).
    # The TPU analog of the reference's published single-vs-multi regime
    # split (reference README.md:11-22).
    "keys": [(16_000_000, "tiled"), (float("inf"), "merge")],
    # 64-bit keys-only: merge (2 lex planes, seed width 32768) wins 1e8 —
    # 319.1 vs 339.9 ms uniform (v5e_u64_seedwidth.csv) AND 319.3 vs 339.7
    # under Zipf (v5e_u64_zipf_seedwidth.csv — the r4 tie was a seed-width
    # artifact; 32768 closes it). r5 bracket at the shipped seed
    # (v5e_u64_keys_crossover_r5.csv): dead tie at 2e7 (57.1 vs 56.8),
    # merge 1.05x at 4e7 (121.5 vs 127.7) — flip encoded at 2e7.
    "keys64": [(20_000_000, "tiled"), (float("inf"), "merge")],
    # kv: re-bracketed in r5 on the shipped syn_tie pipeline (the synthetic
    # tie plane made merge ~10% cheaper, moving the flip down from the
    # pre-syn_tie ~1.5e7): at grain 2^17 + seed width 16384, merge wins 1e7
    # (32.2 vs 34.6 ms), ties 1.5e7 (47.5 vs 47.2) and wins 2e7 (68.5 vs
    # 78.1), 4e7 (146.3 vs 176.8) and 1e8 (384.7 vs 474.6); tiled wins 8e6
    # (21.5 vs 29.1) — v5e_kv_syn_crossover.csv, v5e_kv_mid_grain.csv.
    "kv": [(9_000_000, "tiled"), (float("inf"), "merge")],
    # 64-bit-key kv: the XLA carry degrades super-linearly with the wide
    # comparator while merge just adds a compare plane, and syn_tie pushed
    # the crossover to ~1e6 — r5 bracket (v5e_kv64_syn_crossover.csv):
    # tiled wins 5e5 (1.72 vs 1.99 ms), tie at 1e6 (3.76 vs 3.68), merge
    # wins 2e6 (1.10x), 4e6 (1.32x), 1e7 (1.87x), 1e8 (554.7 vs 1216.9 —
    # 2.19x).
    "kv64": [(800_000, "tiled"), (float("inf"), "merge")],
    # UNSTABLE kv: the relaxation drops the position compare plane, so the
    # merge composite runs 2 planes (key + carried value). Measured vs the
    # packed-u64 direct i64 sort (what "tiled" means here where eligible —
    # dispatch.sort_pairs): merge wins 2e7 (44.4 vs 56.6 ms), 4e7 (96.6 vs
    # 127.9) and 1e8 (253.7 vs 341.4 — 1.35x), all in
    # v5e_kv_unstable_crossover.csv; packed's 463 M/s at 1.6e7 bounds the
    # crossover from below, same ~1.5e7 flip as stable kv.
    "kv_unstable": [(15_000_000, "tiled"), (float("inf"), "merge")],
    # wide keys have no packed path (the pair would need 96 bits), so
    # tiled-unstable IS the stable carry and the stable kv64 crossover
    # bounds this flip from above (merge-unstable, one plane lighter than
    # merge-stable, can only cross earlier)
    "kv_unstable64": [(800_000, "tiled"), (float("inf"), "merge")],
    # argsort: merge (keys+pos 2-plane, grain 2^17, seed width 16384) wins
    # 4e7 (120.1 vs 126.7 ms — v5e_argsort_crossover_w16384.csv) and 1e8
    # (319.0 vs 340.6 — v5e_argsort_seedwidth.csv); tiled packed-i64 won
    # the unseeded 1e7 point (24.8 vs 33.8) and the r5 gap fill validated
    # the 3e7 boundary: tie at 2e7 (56.1 vs 56.5), tiled 1.06x at 3e7
    # (78.2 vs 83.2 — v5e_argsort_crossover_r5.csv). Merge also needs no
    # x64 (the packed path does; without x64 tiled falls back to the 474
    # ms carry).
    "argsort": [(30_000_000, "tiled"), (float("inf"), "merge")],
    # Local phases of the distributed sort (parallel/distributed.py): "xla"
    # is the composite (key, position) lax.sort; "merge" runs the same total
    # order through ops/merge. n here is the PER-SHARD chunk size, and the
    # local sort IS the kv composite (key planes + gidx carry + payloads),
    # so the rows inherit the r5 syn_tie-era kv crossovers: u32 keys flip
    # at ~9e6/shard (v5e_kv_syn_crossover.csv: merge 1.07x at 1e7, 1.14x
    # at 2e7), u64 keys at ~1e6/shard (v5e_kv64_syn_crossover.csv: tie at
    # 1e6, merge 1.10x at 2e6, 1.87x at 1e7).
    "dist_local": [(9_000_000, "xla"), (float("inf"), "merge")],
    "dist_local64": [(800_000, "xla"), (float("inf"), "merge")],
}


def route_for(op: str, n: int, wide: bool = False) -> str:
    """Default engine for ``op`` ("keys" | "kv" | "argsort" | "dist_local")
    at size ``n``; ``wide`` selects the 64-bit-key rows where measured."""
    for max_n, eng in _op_rows(ROUTE_TABLE, op, wide):
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
