#!/usr/bin/env python
"""Assemble the Schwinger-model plain-vs-FT wall-clock ladder (BENCH.md
round-3 Schwinger section) from the committed measurement artifacts.

    python experiments/schwinger_table.py [--dir artifacts/round3]

eff-samples/s/chip = n_chains / (2 * tau_int(Q) * s_per_traj), with
s_per_traj the production run's own in-run wall per batch trajectory
(conservative: includes block/persist overhead). Rows whose artifact is
missing are skipped with a note.
"""
import argparse
import json
import os

ROWS = [
    # (beta, sampler label, artifact file, config note)
    (4.0, "plain", "schwinger_b4_plain_t2n8.json", "tau=2 n8 B=128"),
    (4.0, "FT", "schwinger_b4_ft_ftb6_t05n8.json", "ftb6 tau=.5 n8 B=128"),
    (5.0, "plain", "schwinger_b5_plain_t1n4.json", "tau=1 n4 B=64"),
    (5.0, "plain", "schwinger_b5_plain_t2n8.json", "tau=2 n8 B=128"),
    (5.0, "FT", "schwinger_b5_ft_t05n24.json", "beta3 flow tau=.5 n24 B=64"),
    (5.0, "FT", "schwinger_b5_ft_ftb6_t05n8.json", "ftb6 tau=.5 n8 B=128"),
    (6.0, "plain", "schwinger_b6_plain_t1n4.json", "tau=1 n4 B=128"),
    (6.0, "plain", "schwinger_b6_plain_t2n8.json", "tau=2 n8 B=128"),
    (6.0, "FT", "schwinger_b6_ft_ftb6_t05n8.json", "ftb6 tau=.5 n8 B=128"),
    (6.0, "FT", "schwinger_b6_ft_ftb6_t05n4.json", "ftb6 tau=.5 n4 B=128"),
    (7.0, "plain", "schwinger_b7_plain_t2n8.json", "tau=2 n8 B=128"),
    (7.0, "FT", "schwinger_b7_ft_ftb6_t05n8.json", "ftb6 tau=.5 n8 B=128"),
    (7.0, "FT", "schwinger_b7_ft_ftb6_t05n4.json", "ftb6 tau=.5 n4 B=128"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="artifacts/round3")
    p.add_argument("--s-per-traj-override", action="append", default=[],
                   help="file=VALUE: replace a run's s_per_traj (e.g. when "
                        "the recorded wall includes a worker-crash stall)")
    args = p.parse_args()
    overrides = dict((kv.split("=")[0], float(kv.split("=")[1]))
                     for kv in args.s_per_traj_override)

    print(f"{'beta':>4} {'sampler':>7} {'config':>28} {'acc':>6} "
          f"{'tau_int(Q)':>14} {'chi_Q':>13} {'s/traj':>8} {'eff/s':>7}")
    for beta, sampler, fname, note in ROWS:
        path = os.path.join(args.dir, fname)
        if not os.path.exists(path):
            print(f"{beta:>4} {sampler:>7} {note:>28}   -- missing: {fname}")
            continue
        r = json.load(open(path))
        spt = overrides.get(fname, r["s_per_traj"])
        eff = r["n_chains"] / (2.0 * r["tau_int_q"] * spt)
        print(f"{beta:>4} {sampler:>7} {note:>28} {r['acc']:>6.3f} "
              f"{r['tau_int_q']:>8.1f}({r['tau_int_q_err']:.1f}) "
              f"{r['chi_q']:>8.3f}({r['chi_q_err']:.3f}) "
              f"{spt:>8.4f} {eff:>7.2f}")


if __name__ == "__main__":
    main()
