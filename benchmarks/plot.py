"""Render timing plots from sweep CSVs — the analog of the reference's
``timings/*.png`` assets (reference README.md:251-283), produced from the
same kind of CSV its commented-out appenders wrote.

Usage:
    python benchmarks/plot.py sweep.csv               # -> timings/*.png
    python benchmarks/plot.py a.csv b.csv --out dir
"""

from __future__ import annotations

import argparse
import collections
import csv
import os


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csvs", nargs="+", help="CSV files from benchmarks/sweep.py")
    ap.add_argument("--out", default="timings", help="output directory")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    grain_rows = []
    for path in args.csvs:
        with open(path, newline="") as fh:
            for r in csv.DictReader(fh):
                # benchmarks/grain_sweep.py rows carry a `grain` column
                # (tile_target in older CSVs); sweep.py rows carry `dtype`
                if "grain" in r or "tile_target" in r:
                    grain_rows.append(r)
                else:
                    rows.append(r)
    os.makedirs(args.out, exist_ok=True)

    # Grain-study plots — the analog of the reference's per-N NBPW curves
    # (timings/radixsort_multi_<N>.png): time vs elements-per-tile, one
    # curve per N, one figure per (engine, op).
    ggroups = collections.defaultdict(lambda: collections.defaultdict(list))
    for r in grain_rows:
        grain = int(r.get("grain") or r["tile_target"])
        op = "kv" if r.get("kv", "0") == "1" else "keys"
        key = (r.get("engine", "samplesort"), op)
        ggroups[key][int(r["n"])].append((grain, float(r["tpu_ms"])))
    for (engine, op), by_n in ggroups.items():
        fig, ax = plt.subplots(figsize=(7, 5))
        for n, pts in sorted(by_n.items()):
            pts.sort()
            ax.plot([p[0] for p in pts], [p[1] for p in pts],
                    marker="o", label=f"N={n:.0e}")
        ax.set_xscale("log", base=2)
        ax.set_yscale("log")
        ax.set_xlabel("grain (elements per tile)")
        ax.set_ylabel("sort time (ms)")
        ax.set_title(f"{engine} {op}: grain sweep — TPU v5e")
        ax.grid(True, which="both", alpha=0.3)
        ax.legend()
        name = f"grain_{engine}_{op}.png"
        fig.savefig(os.path.join(args.out, name), dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {os.path.join(args.out, name)}")

    # One comparison plot per (dtype, op, distribution): engine curves of
    # time vs N on log-log axes, like timings/radixsort_comparison.png.
    # Older CSVs predate the `op` column; derive it from `kv` there.
    groups = collections.defaultdict(lambda: collections.defaultdict(list))
    for r in rows:
        if "engine" not in r or "tpu_ms" not in r:
            continue  # other result CSVs (e.g. the scaling studies)
        op = r.get("op") or ("kv" if r.get("kv") == "1" else "keys")
        key = (r["dtype"], op, r["distribution"])
        groups[key][r["engine"]].append((int(r["n"]), float(r["tpu_ms"])))

    for (dtype, op, dist), engines in groups.items():
        fig, ax = plt.subplots(figsize=(7, 5))
        for engine, pts in sorted(engines.items()):
            pts.sort()
            ax.plot([p[0] for p in pts], [p[1] for p in pts],
                    marker="o", label=engine)
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.set_xlabel("N (elements)")
        ax.set_ylabel("sort time (ms)")
        kind = {
            "kv": "key-value pairs",
            "kv_unstable": "key-value pairs (unstable, packed u64)",
            "argsort": "argsort",
            "keys": "keys",
        }.get(op, op)
        ax.set_title(f"{dtype} {kind}, {dist} — TPU v5e")
        ax.grid(True, which="both", alpha=0.3)
        ax.legend()
        name = f"sort_comparison_{dtype}_{op}_{dist}.png"
        fig.savefig(os.path.join(args.out, name), dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {os.path.join(args.out, name)}")


if __name__ == "__main__":
    main()
