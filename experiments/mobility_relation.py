#!/usr/bin/env python
"""Calibrate the mobility relation tau_int(Q) ~ r * chi_Q / mobility.

Earlier round-3 text used r = 1 ("tau ~ chi_Q/mobility, validated 12%
worst case") — but that validation compared against UNCONVERGED direct
chains (17–22 tau), whose tau_int is biased low by 25–70% (BENCH.md
convergence study); the two biases cancelled. On chains >= min-tau the
coefficient is r = tau*mob/chi_Q ~ 1.75–2.4, drifting DOWN slowly with
beta (this script prints the calibration table from the committed
artifacts; BENCH.md quotes the band r = 1.9 +- 0.2).

Use: tau_est(config) = r(beta) * chi_Q / mobility(config), with chi_Q
from the most-converged chain at the point (it is config-independent)
and mobility from an equilibrium probe of THAT config. The r drift is
the dominant systematic; quote tau_est with the r band, not just the
bootstrap error.

    python experiments/mobility_relation.py [--min-tau 30]
"""
import argparse
import glob
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="artifacts/round3")
    p.add_argument("--min-tau", type=float, default=30.0,
                   help="minimum chain length in units of tau_int")
    args = p.parse_args()

    rows = []
    for f in sorted(glob.glob(f"{args.dir}/schwinger_*.json")):
        d = json.load(open(f))
        c = d.get("config", {})
        tau, mob, chi = (d.get("tau_int_q"), d.get("q_mobility_dt1"),
                         d.get("chi_q"))
        if not tau or not mob:
            continue
        ntau = d.get("ntraj_used", 0) / tau
        if ntau < args.min_tau:
            continue
        r = tau / (chi / mob)
        rows.append((c.get("L"), c.get("beta"), d["sampler"],
                     f.split("/")[-1], tau, ntau, r))

    rows.sort()
    print(f"{'L':>3} {'beta':>4} {'sampler':>6} {'tau':>8} {'len/tau':>8}"
          f" {'r = tau*mob/chi':>16}  artifact")
    for L, beta, s, f, tau, ntau, r in rows:
        print(f"{L:>3} {beta:>4.0f} {s:>6} {tau:>8.1f} {ntau:>8.1f}"
              f" {r:>16.3f}  {f}")


if __name__ == "__main__":
    main()
