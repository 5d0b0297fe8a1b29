#!/usr/bin/env python
"""Reduce the queue_matrix.json cell artifacts into the verdict matrix.

    python experiments/matrix_report.py [--dir artifacts/matrix]
                                        [--min-events 50]

Verdict method: the chi-/r-free mobility-ratio pair (the round-4 closing
method, BENCH.md) — per cell, each side's best valid row by wall-clock
mobility B*mob/s; the ratio of the two IS the eff-samples/s ratio at
matched physics (chi_Q is a property of the point, not the sampler).
Rows below the event floor are shown but never become verdicts
(the BENCH statistics-floor protocol).
"""
import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from schwinger_table import mobility_rate, ratio_verdict  # noqa: E402


def load_cells(d):
    cells = {}
    for path in sorted(glob.glob(os.path.join(d, "cell_L*.json"))):
        m = re.match(r"cell_L(\d+)b(\d+(?:\.\d+)?)_(plain|ft)",
                     os.path.basename(path))
        if not m:
            continue
        L, beta, sampler = int(m.group(1)), float(m.group(2)), m.group(3)
        data = json.load(open(path))
        n_chains = data["args"]["chains"]
        ntraj = data["args"]["ntraj"]
        for row in data.get("rows", []):
            rate, rel, nev = mobility_rate(row, n_chains, ntraj)
            cells.setdefault((L, beta), {}).setdefault(sampler, []).append(
                dict(nstep=row["nstep"], tau=row.get("tau_used"),
                     acc=row["acc"], rate=rate, rel=rel, nev=nev))
    return cells


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="artifacts/matrix")
    p.add_argument("--min-events", type=float, default=50)
    args = p.parse_args()
    cells = load_cells(args.dir)
    if not cells:
        print(f"no cell artifacts under {args.dir} — run the queue first:"
              "\n  python -m fthmc_tpu.runner --queue "
              "experiments/queue_matrix.json")
        return 1

    print(f"{'cell':>10} | {'side':>5} | {'config':>12} | {'acc':>5} | "
          f"{'B*mob/s':>9} | {'events':>6} | verdict")
    print("-" * 78)
    for (L, beta) in sorted(cells):
        sides = cells[(L, beta)]
        best = {}
        for sampler in ("plain", "ft"):
            for r in sorted(sides.get(sampler, []),
                            key=lambda r: -r["rate"]):
                ok = r["nev"] >= args.min_events
                tag = "" if ok else f"  [< {args.min_events:.0f}ev floor]"
                print(f"{L:>6}^2 b{beta:g} | {sampler:>5} | "
                      f"tau={r['tau']:g} n{r['nstep']:<4} | "
                      f"{r['acc']:.3f} | {r['rate']:9.3g} | "
                      f"{r['nev']:6.0f} |{tag}")
                if ok and sampler not in best:
                    best[sampler] = (r["rate"], r["rel"])
        if "plain" in best and "ft" in best:
            who, fac, _, rel = ratio_verdict(best["ft"], best["plain"])
            print(f"{'':>10} | VERDICT: {who} x{fac:.2f} "
                  f"+- {100 * rel:.0f}%")
        else:
            missing = [s for s in ("plain", "ft") if s not in best]
            print(f"{'':>10} | VERDICT WITHHELD (no floor-clearing row: "
                  f"{', '.join(missing)})")
        print("-" * 78)
    return 0


if __name__ == "__main__":
    sys.exit(main())
