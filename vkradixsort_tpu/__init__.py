"""vkradixsort_tpu — a TPU-native vectorized sort engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the Vulkan/GLSL
radix sort reference (MircoWerner/VkRadixSort): stable LSD radix sort over
uint32/uint64 keys and key-value pairs, with a size-adaptive dispatch between
a fused in-VMEM kernel (analog of ``single_radixsort.comp``) and a multi-pass
tiled HBM pipeline (analog of ``multi_radixsort_histograms.comp`` +
``multi_radixsort.comp``), extended to multi-chip / multi-host TPU meshes via
splitter-sampled range partitioning and an all-to-all key shuffle.

Public API (analog of the reference's ``SingleRadixSort::execute`` /
``MultiRadixSort::execute``, reference singleradixsort/include/SingleRadixSort.h:21
and multiradixsort/include/MultiRadixSort.h:21, but exposed as proper functions
rather than hard-coded drivers):

    sort(keys)                      -> sorted keys
    sort_pairs(keys, values)        -> (sorted keys, values permuted alongside)
    argsort(keys)                   -> stable argsort indices
    sort_sharded(keys, mesh, axis)  -> multi-device distributed sort
"""

from vkradixsort_tpu.ops.dispatch import argsort, sort, sort_pairs, sort_segments
from vkradixsort_tpu.ops.common import (
    decode_keys,
    encode_keys,
    sortable_dtype,
)
from vkradixsort_tpu.engine.config import SortConfig
from vkradixsort_tpu.engine.context import TPUContext

__version__ = "0.1.0"

__all__ = [
    "sort",
    "sort_pairs",
    "argsort",
    "sort_segments",
    "encode_keys",
    "decode_keys",
    "sortable_dtype",
    "SortConfig",
    "TPUContext",
    "__version__",
]
