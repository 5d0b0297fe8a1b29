#!/usr/bin/env python
"""Assemble the Schwinger-model plain-vs-FT wall-clock ladder (BENCH.md
round-3 Schwinger section) from the committed measurement artifacts.

    python experiments/schwinger_table.py [--dir artifacts/round3]

eff-samples/s/chip = n_chains / (2 * tau_int(Q) * s_per_traj). tau_int
comes from the longest (most converged) production chain per point;
s_per_traj from the stage-8c/8d RE-TIMED equilibrium rows (the half-spinor
hop + fused kernels landed after the original chains ran, so in-run chain
timings overstate the shipped code's cost) — falling back to the chain's
own in-run timing when no re-time exists. Both are printed.
"""
import argparse
import json
import os

ROWS = [
    # (beta, sampler label, tau_int artifact, nstep, tau, config note)
    (4.0, "plain", "schwinger_b4_plain_t2n8.json", 8, 2.0, "tau=2 n8 B=128"),
    (4.0, "FT", "schwinger_b4_ft_ftb6_t05n8.json", 8, 0.5, "ftb6 t=.5 n8"),
    (5.0, "plain", "schwinger_b5_plain_t2n8.json", 8, 2.0, "tau=2 n8 B=128"),
    (5.0, "FT", "schwinger_b5_ft_ftb6_t05n8.json", 8, 0.5, "ftb6 t=.5 n8"),
    (6.0, "plain", "schwinger_b6_plain_t2n8.json", 8, 2.0, "tau=2 n8 B=128"),
    (6.0, "plain", "schwinger_b6_plain_t1n4.json", 4, 1.0, "tau=1 n4 B=128"),
    (6.0, "FT", "schwinger_b6_ft_ftb6_t05n4.json", 4, 0.5, "ftb6 t=.5 n4"),
    (6.0, "FT", "schwinger_b6_ft_ftb6_t05n8.json", 8, 0.5, "ftb6 t=.5 n8"),
    (7.0, "plain", "schwinger_b7_plain_t2n8_40tau.json", 8, 2.0,
     "tau=2 n8 B=128 (36tau)"),
    (7.0, "FT", "schwinger_b7_ft_ftb6_t05n4_40tau.json", 4, 0.5,
     "ftb6 t=.5 n4 (42tau)"),
    (7.0, "FT", "schwinger_b7_ft_ftb6_t05n8.json", 8, 0.5, "ftb6 t=.5 n8"),
]


def load_retimes(adir):
    """{(beta, sampler, nstep, tau, backend): s_per_traj} from the stage-8c
    (xla) and stage-8d (fused) equilibrium re-time scans."""
    out = {}
    for beta in (4, 5, 6, 7):
        for backend, fname in (("xla", f"retime_b{beta}.json"),
                               ("fused", f"retime_b{beta}_fused.json")):
            path = os.path.join(adir, fname)
            if not os.path.exists(path):
                continue
            for r in json.load(open(path))["rows"]:
                sampler = "FT" if r["sampler"] == "ft" else "plain"
                key = (float(beta), sampler, r["nstep"],
                       float(r["tau_used"]), backend)
                out[key] = r["s_per_traj"]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="artifacts/round3")
    args = p.parse_args()
    retimes = load_retimes(args.dir)

    print(f"{'beta':>4} {'sampler':>7} {'config':>24} {'acc':>6} "
          f"{'tau_int(Q)':>14} {'chi_Q':>13} {'s/traj':>20} {'eff/s':>7}")
    for beta, sampler, fname, nstep, tau, note in ROWS:
        path = os.path.join(args.dir, fname)
        if not os.path.exists(path):
            print(f"{beta:>4} {sampler:>7} {note:>24}   -- missing: {fname}")
            continue
        r = json.load(open(path))
        spt_run = r["s_per_traj"]
        spt_x = retimes.get((beta, sampler, nstep, tau, "xla"))
        spt_f = retimes.get((beta, sampler, nstep, tau, "fused"))
        best = min(v for v in (spt_run, spt_x, spt_f) if v is not None)
        eff = r["n_chains"] / (2.0 * r["tau_int_q"] * best)
        parts = [f"run:{spt_run:.4f}"]
        if spt_x is not None:
            parts.append(f"x:{spt_x:.4f}")
        if spt_f is not None:
            parts.append(f"f:{spt_f:.4f}")
        print(f"{beta:>4} {sampler:>7} {note:>24} {r['acc']:>6.3f} "
              f"{r['tau_int_q']:>8.1f}({r['tau_int_q_err']:.1f}) "
              f"{r['chi_q']:>8.3f}({r['chi_q_err']:.3f}) "
              f"{' '.join(parts):>20} {eff:>7.2f}")


if __name__ == "__main__":
    main()
