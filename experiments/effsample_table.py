#!/usr/bin/env python
"""Assemble the wall-clock-per-effective-sample table (round 3, VERDICT #1).

Effective topological samples per second per chip:

    eff/s = n_chains / (2 * tau_int(Q) * s_per_traj)

with tau_int per trajectory (chain-bootstrap errors) and s_per_traj the
IN-SCAN batch-trajectory wall time (scalar-fence timing; the same
accounting on both sides). Inputs: tauint_run fthmc_results.json /
plain_tauint hmc_results.json files plus timing scans.

Usage (entries are label=path pairs; timing override with @s_per_traj):
  python experiments/effsample_table.py \
    ft_b6_opt=runs/tauint_b6_t05n16/fthmc_results.json@0.095 \
    plain_b6=artifacts/tauint_highbeta/b6_hmc.json@0.00125
"""
import json
import sys


def main():
    rows = []
    for arg in sys.argv[1:]:
        label, rest = arg.split("=", 1)
        if "@" in rest:
            path, s_traj = rest.rsplit("@", 1)
            s_traj = float(s_traj)
        else:
            path, s_traj = rest, None
        d = json.load(open(path))
        if s_traj is None:
            s_traj = d.get("s_per_traj")
        cfg = d.get("config", {})
        chains = int(d.get("n_chains", cfg.get("chains",
                                               cfg.get("n_chains", 0))))
        ti = float(d["tau_int_q"])
        err = float(d.get("tau_int_q_err", 0.0))
        eff = chains / (2.0 * ti * s_traj)
        eff_err = eff * err / ti if ti else 0.0
        rows.append({
            "label": label, "chains": chains, "acc": d.get("acc"),
            "tau_int_q": ti, "tau_int_q_err": err,
            "chi_q": d.get("chi_q"), "chi_q_err": d.get("chi_q_err"),
            "s_per_traj": s_traj,
            "eff_samples_per_s": eff, "eff_samples_per_s_err": eff_err,
        })
    print(f"{'label':<16}{'chains':>7}{'acc':>7}{'tau_int(Q)':>16}"
          f"{'s/traj':>10}{'eff/s/chip':>14}")
    for r in rows:
        print(f"{r['label']:<16}{r['chains']:>7}{r['acc']:>7.3f}"
              f"{r['tau_int_q']:>10.2f} ± {r['tau_int_q_err']:<5.2f}"
              f"{r['s_per_traj']:>8.4f}"
              f"{r['eff_samples_per_s']:>9.2f} ± "
              f"{r['eff_samples_per_s_err']:<.2f}")
    json.dump(rows, open("/tmp/effsample_table.json", "w"), indent=1)


if __name__ == "__main__":
    main()
