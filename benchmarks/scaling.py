"""Distributed-sort scaling study on the virtual CPU mesh.

Only one physical TPU chip is reachable from this box, so wall-clock
multi-chip scaling cannot be measured here. What CAN be measured — and what
actually determines scaling efficiency for a one-shuffle sample sort — is
measured on a virtual P-device mesh and reported per P:

  * load balance: max/mean shard occupancy after the splitter partition
    (perfect = 1.0; the quantity that turns into straggler time),
  * shuffle volume: exact bytes each shard puts on the interconnect in the
    ONE all-to-all, vs. the n/P ideal,
  * overflow margin: largest bucket as a fraction of the static cap
    (>1.0 would mean a retry with larger slack).

The model: per-chip time ~ local_sort(n/P) + all2all(bytes/bisection BW)
+ final_sort(max_shard). With balance b and the measured single-chip sort
rate s (BENCHMARKS.md), efficiency ~ 1 / (b + shuffle_bytes*s/BW_ici/4).
For v5e ICI (~4x45 GB/s/chip) and s=560 M keys/s, balance dominates —
which is why the splitter/balancing machinery is what this script grades.

Usage:
    python benchmarks/scaling.py [--n 4194304] [--dist zipf]
"""

from __future__ import annotations

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=1 << 22)
    ap.add_argument("--dist", default="uniform",
                    choices=["uniform", "uniform28", "descending", "constant", "zipf"])
    ap.add_argument("--oversample", type=int, default=32)
    ap.add_argument("--slack", type=float, default=2.0)
    ap.add_argument("--overlap-chunks", type=int, default=1,
                    help="software-pipelined body with K chunks (1 = plain)")
    args = ap.parse_args()

    from vkradixsort_tpu.parallel.distributed import gather_sorted, sort_sharded
    from vkradixsort_tpu.utils.fixtures import make_keys

    rng = np.random.default_rng(0x5CA1E)
    C = args.overlap_chunks
    print("P,chunks,balance_max_over_mean,shuffle_bytes_per_chip,ideal_bytes,overflow,exact")
    for P in [2, 4, 8]:
        n = (args.n // (P * P * C)) * (P * P * C)
        keys = make_keys(rng, n, np.uint32, args.dist)
        mesh = jax.sharding.Mesh(np.asarray(jax.devices("cpu")[:P]), ("x",))
        pk, counts, overflow = sort_sharded(
            jnp.asarray(keys), mesh, slack=args.slack,
            oversample=args.oversample, overlap_chunks=C,
        )
        counts = np.asarray(counts)
        got = gather_sorted(pk, counts)
        exact = bool(np.array_equal(got, np.sort(keys)))
        balance = counts.max() / counts.mean()
        # every key leaves its home shard with prob (P-1)/P in expectation;
        # measured volume = what the padded exchange actually ships
        cap = int(args.slack * (n // P) / (C * P)) + 64
        shipped = C * P * cap * keys.dtype.itemsize  # per chip, padded buffers
        ideal = (n // P) * keys.dtype.itemsize
        print(f"{P},{C},{balance:.4f},{shipped},{ideal},{bool(np.any(overflow))},{exact}")


if __name__ == "__main__":
    main()
