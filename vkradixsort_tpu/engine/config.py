"""Sort configuration — the analog of the reference's three config tiers.

The reference configures via shader ``#define``s (WORKGROUP_SIZE=256,
RADIX_SORT_BINS=256, ITERATIONS — single_radixsort.comp:10-14), host
compile-time constants (SORT_32BIT / SORT_64_BIT, NUM_BLOCKS_PER_WORKGROUP —
SingleRadixSort.h:10-18, MultiRadixSort.cpp:12) and runtime push constants
(multi_radixsort.comp:17-22). On TPU all of these become static Python
config specialized at trace time (SURVEY.md §5 "Config / flag system").
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
        time are prohibitive.
      chunk: elements per rank/scatter chunk inside kernels; destination
        range of one MXU one-hot scatter. Power of two, multiple of 128.
      tile: elements per grid step of the radix_tiled pipeline — the analog
        of NUM_BLOCKS_PER_WORKGROUP * WORKGROUP_SIZE elements per workgroup
        (reference MultiRadixSort.cpp:12-17); the central grain-size knob.
      msd_bits: top bits used by the large-N MSD bucketize stage.
      interpret: run Pallas kernels in interpreter mode (the validation-
        layer analog, SURVEY.md §5 "race detection").
    """

    fused_max_n: int = 1 << 15
    chunk: int = 2048
    tile: int = 1 << 19
    msd_bits: int = 8
    interpret: bool = False

    def replace(self, **kw) -> "SortConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = SortConfig()
