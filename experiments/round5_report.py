#!/usr/bin/env python
"""Digest the round-5 artifacts as they land: the 64^2 beta=9 crossover
probes, the anchored fermion-aware fine-tune program (mobility-selected),
the lambda-prop-depth trains, the flagship bench rows, and the 64^2 FT
profile. Prints only what exists.

    python experiments/round5_report.py [--dir artifacts/round5]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from round4_report import show_scan, show_train  # noqa: E402

SCANS = [
    ("probe_L64b9_plain_n16.json", "64^2 beta=9 plain n16 (tau=2)"),
    ("probe_L64b9_plain_n12.json", "64^2 beta=9 plain n12 (tau=2)"),
    ("probe_L64b9_ft_n12.json", "64^2 beta=9 FT n12 (dt=1/24, bf16)"),
    ("probe_L64b9_ft_n8.json", "64^2 beta=9 FT n8 (dt=1/16, bf16)"),
    ("anchor_ab16b6.json", "16^2 beta=6 anchored-fermaware A/B"),
    ("anchor_ab16b9.json", "16^2 beta=9 anchored-fermaware A/B"),
]

TRAINS = [
    ("anchor_lam03.json", "anchored KL+0.3*fermF2 fine-tune (lr 2e-5)"),
    ("anchor_lam10.json", "anchored KL+1.0*fermF2 fine-tune (lr 2e-5)"),
    ("train24l_lam2_s7.json", "24L lambda=2 seed 7 (depth-dose)"),
    ("train24l_lam4_s7.json", "24L lambda=4 seed 7 (depth-dose)"),
]


def show_train_with_mob(path, label):
    show_train(path, label)
    d = json.load(open(path))
    for pr in d.get("mob_probes", []):
        print(f"   era {pr['era']:>2}: B*mob/s {pr['B_mob_per_s']:.3g} "
              f"+- {pr['B_mob_per_s_err']:.2g} (acc {pr['acc']:.3f}, "
              f"{pr['n_events']:.0f} ev)")
    if "mob_best_era" in d:
        print(f"   best-by-mobility era: {d['mob_best_era']}")


def show_bench(path, label):
    d = json.load(open(path))
    print(f"-- {label} ({os.path.basename(path)})")
    for k, r in d.items():
        if isinstance(r, dict) and "value" in r:
            extra = (f"  ({1e3 * r['s_per_traj']:.1f} ms/traj)"
                     if "s_per_traj" in r else "")
            print(f"   {k:>26}: {r['value']:.4g} {r.get('unit','')}{extra}")


def show_profile(path, label):
    d = json.load(open(path))
    print(f"-- {label} ({os.path.basename(path)})")
    for k, v in d.items():
        if isinstance(v, float):
            print(f"   {k:>22}: {1e3 * v:8.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="artifacts/round5")
    args = p.parse_args()
    for group, shower in ((SCANS, show_scan),
                          (TRAINS, show_train_with_mob)):
        for fname, label in group:
            path = os.path.join(args.dir, fname)
            if os.path.exists(path):
                try:
                    shower(path, label)
                except Exception as e:
                    print(f"-- {label}: unreadable ({e})")
            else:
                print(f"-- {label}: pending")
        print()
    for fname, label, shower in (
            ("BENCH_extra_r5.json", "flagship bench rows", show_bench),
            ("profile_ft64.json", "64^2 FT step profile", show_profile)):
        path = os.path.join(args.dir, fname)
        if os.path.exists(path):
            try:
                shower(path, label)
            except Exception as e:
                print(f"-- {label}: unreadable ({e})")
        else:
            print(f"-- {label}: pending")


if __name__ == "__main__":
    main()
