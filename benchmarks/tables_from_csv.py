"""Derive measured routing/grain table rows from sweep CSVs.

Reads benchmarks/sweep.py CSVs (engine comparison) and
benchmarks/grain_sweep.py CSVs (grain study) and prints the
``ROUTE_TABLE`` / ``GRAIN_TABLE`` literals that encode the winners — the
step between the reference's published NBPW sweeps and its hard-coded
optimum (reference README.md:253-264 reads the sweet spot off the plots by
eye; here it's computed and pasted into engine/config.py).

Routing rows: for each op, at each measured N the fastest exact engine
wins; contiguous N-ranges with the same winner collapse into
``(max_n, engine)`` rows (upper bound = midpoint to the next measured N in
log space, inf for the last).

Usage:
    python benchmarks/tables_from_csv.py results/v5e_merge_vs_tiled_*.csv \
        --grain results/v5e_merge_grain*.csv
"""

from __future__ import annotations

import argparse
import collections
import csv


def load(paths):
    rows = []
    for p in paths:
        with open(p, newline="") as fh:
            rows.extend(csv.DictReader(fh))
    return rows


def route_rows(rows):
    """op -> list of (max_n, engine) measured-winner rows."""
    by_op = collections.defaultdict(dict)  # op -> n -> (ms, engine)
    for r in rows:
        if int(r.get("exact", 0)) != 1:
            continue
        op = r.get("op") or ("kv" if r.get("kv") == "1" else "keys")
        if op not in ("keys", "kv", "argsort"):
            continue  # kv_gather/kv_unstable are variants, not routed ops
        if r.get("payload") not in (None, "", "u32"):
            continue  # routing keys on the default single-u32-payload shape
        n, ms = int(r["n"]), float(r["tpu_ms"])
        cur = by_op[op].get(n)
        if cur is None or ms < cur[0]:
            by_op[op][n] = (ms, r["engine"])
    out = {}
    for op, by_n in sorted(by_op.items()):
        ns = sorted(by_n)
        rows_op = []
        for i, n in enumerate(ns):
            eng = by_n[n][1]
            # upper bound: log-midpoint to the next measured size
            hi = float("inf") if i + 1 == len(ns) else int((n * ns[i + 1]) ** 0.5)
            if rows_op and rows_op[-1][1] == eng:
                rows_op[-1] = (hi, eng)
            else:
                rows_op.append((hi, eng))
        out[op] = rows_op
    return out


def grain_rows(rows):
    """(engine, op) -> list of (max_n, grain) measured-optimum rows."""
    by_key = collections.defaultdict(dict)
    for r in rows:
        if int(r.get("exact", 0)) != 1:
            continue
        # older grain CSVs predate the engine/grain columns (tile_target)
        key = (r.get("engine", "samplesort"), "kv" if r.get("kv") == "1" else "keys")
        n, ms = int(r["n"]), float(r["tpu_ms"])
        g = int(r.get("grain") or r["tile_target"])
        cur = by_key[key].get(n)
        if cur is None or ms < cur[0]:
            by_key[key][n] = (ms, g)
    out = {}
    for key, by_n in sorted(by_key.items()):
        ns = sorted(by_n)
        rows_k = []
        for i, n in enumerate(ns):
            g = by_n[n][1]
            hi = float("inf") if i + 1 == len(ns) else int((n * ns[i + 1]) ** 0.5)
            if rows_k and rows_k[-1][1] == g:
                rows_k[-1] = (hi, g)
            else:
                rows_k.append((hi, g))
        out[key] = rows_k
    return out


def fmt_bound(b):
    return 'float("inf")' if b == float("inf") else f"{int(b):_d}"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csvs", nargs="+", help="sweep.py comparison CSVs")
    ap.add_argument("--grain", nargs="*", default=[], help="grain_sweep.py CSVs")
    args = ap.parse_args()

    print("# measured ROUTE_TABLE rows (engine/config.py):")
    for op, rows in route_rows(load(args.csvs)).items():
        body = ", ".join(f"({fmt_bound(b)}, {e!r})" for b, e in rows)
        print(f'    "{op}": [{body}],')

    if args.grain:
        print("# measured GRAIN_TABLE rows:")
        for (eng, op), rows in grain_rows(load(args.grain)).items():
            body = ", ".join(f"({fmt_bound(b)}, {g})" for b, g in rows)
            print(f'    "{eng}" / "{op}": [{body}],')


if __name__ == "__main__":
    main()
