#!/usr/bin/env python
"""Assemble the round-3 plain-vs-FT eff-samples/s/chip table from the
measurement runs (markdown to stdout + JSON sidecar).

eff/s = n_chains / (2 * tau_int(Q) * s_per_traj), both samplers at their
measured cost-optimal settings, s_per_traj from the tauint runs' own
in-run accounting at the stated batch. The B=128 projection for FT uses
the measured chains-scaling fact (B=128 costs the same wall per traj as
B=64 at 16^2 - runs/chains_scaling_b6) and is labeled as such.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = [
    # (label, ft_json, plain_json, plain_timing_scan or None)
    ("16^2 b4", "runs/tauint_b4_t05n48/fthmc_results.json",
     "artifacts/tauint_highbeta/b4_hmc.json", "runs/plain_timing_b4/scan.json"),
    ("16^2 b5", "runs/tauint_b5_opt/fthmc_results.json",
     "artifacts/tauint_highbeta/b5_hmc.json", "runs/plain_timing_b5/scan.json"),
    # s_per_traj override: that run resumed from persisted state, so its
    # in-run wall covers ~0 new trajectories - use the in-scan measurement
    # (runs/effscan_b6, B=64) instead.
    ("16^2 b6", "artifacts/round3/tauint_b6_t05n16.json",
     "artifacts/tauint_highbeta/b6_hmc.json", "artifacts/round3/plain_timing_b6.json",
     0.095),
    ("16^2 b6 (fine-tuned flow)", "artifacts/round3/tauint_b6_ft_t05n8.json",
     "artifacts/tauint_highbeta/b6_hmc.json", "artifacts/round3/plain_timing_b6.json"),
    ("16^2 b6 (12-layer flow)", "runs/tauint_b6_12l/fthmc_results.json",
     "artifacts/tauint_highbeta/b6_hmc.json", "artifacts/round3/plain_timing_b6.json"),
    ("16^2 b7", "artifacts/round3/tauint_b7_t05n12.json",
     "artifacts/tauint_highbeta/b7_hmc.json", "artifacts/round3/plain_timing_b7.json"),
    # round-3 EXTENDED chain (32k traj): the 8k chain underestimated
    # tau_FT 3x (457 -> 1494); plain-side artifacts from the original run
    ("16^2 b8", "artifacts/round3/tauint_b8_ext_t05n8.json",
     "runs/plain_tauint_b8/hmc_results.json", "runs/plain_timing_b8/scan.json"),
    ("32^2 b5", "runs/tauint_b5_L32_opt/fthmc_results.json",
     "artifacts/tauint_highbeta/b5_L32_hmc.json", "runs/plain_timing_b5_L32/scan.json"),
]


def best_plain(scan_path):
    d = json.load(open(scan_path))
    pts = d["points"]
    best = max(pts, key=lambda p: p["q_mobility"] / p["s_per_traj"])
    return best, int(d["args"]["chains"])


def main():
    out = []
    print("| point | sampler | config | acc | tau_int(Q) | s/traj (B) | "
          "eff-samples/s/chip | tau-ratio | wall-gap |")
    print("|---|---|---|---|---|---|---|---|---|")
    for row in ROWS:
        label, ft_path, pl_path, plt_path = row[:4]
        s_override = row[4] if len(row) > 4 else None
        if not (os.path.exists(ft_path) and os.path.exists(pl_path)):
            print(f"| {label} | (pending: {ft_path}) | | | | | | | |")
            continue
        ft = json.load(open(ft_path))
        pl = json.load(open(pl_path))
        ft_B = int(ft.get("n_chains", 64))
        ft_s = (float(s_override) if s_override is not None
                else float(ft["s_per_traj"]))
        ft_t = float(ft["tau_int_q"])
        ft_te = float(ft.get("tau_int_q_err", 0.0))
        ft_eff = ft_B / (2 * ft_t * ft_s)
        cfg = ft.get("config", {})
        ft_cfg = f"tau={cfg.get('tau','?')}/n{cfg.get('nstep','?')}"

        pl_t = float(pl["tau_int_q"])
        pl_te = float(pl.get("tau_int_q_err", 0.0))
        if plt_path and os.path.exists(plt_path):
            bp, pl_B = best_plain(plt_path)
            pl_s, pl_cfg = bp["s_per_traj"], f"n{bp['nstep']}"
            pl_acc = bp["acc"]
        else:
            pl_B = int(pl.get("n_chains", 128))
            pl_s = float(pl["wall_s"]) / float(pl.get("ntraj_used", 1) * 4 / 3)
            pl_cfg, pl_acc = "(run avg)", float(pl.get("acc", 0))
        pl_eff = pl_B / (2 * pl_t * pl_s)
        ratio = pl_t / ft_t
        gap = pl_eff / ft_eff
        print(f"| {label} | plain | tau=1/{pl_cfg} B={pl_B} | {pl_acc:.3f} "
              f"| {pl_t:.1f} ± {pl_te:.1f} | {pl_s:.2e} | **{pl_eff:.0f}** "
              f"| | |")
        print(f"| {label} | FT b3-flow | {ft_cfg} B={ft_B} "
              f"| {float(ft['acc']):.3f} | {ft_t:.1f} ± {ft_te:.1f} "
              f"| {ft_s:.3f} | **{ft_eff:.1f}** | {ratio:.1f}x "
              f"| {gap:.0f}x |")
        out.append({
            "label": label, "ft": {
                "config": ft_cfg, "B": ft_B, "acc": float(ft["acc"]),
                "tau_int_q": ft_t, "tau_int_q_err": ft_te,
                "s_per_traj": ft_s, "eff_per_s": ft_eff},
            "plain": {
                "config": pl_cfg, "B": pl_B, "acc": pl_acc,
                "tau_int_q": pl_t, "tau_int_q_err": pl_te,
                "s_per_traj": pl_s, "eff_per_s": pl_eff},
            "tau_ratio": ratio, "wall_gap": gap})
    with open("runs/round3_table.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
