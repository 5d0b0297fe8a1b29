#!/usr/bin/env python
"""Digest the round-4 artifacts as they land: fine-tune acceptance
ladders (finetune_force results), mobility A/B scans (schwinger_mts_scan
rows with the round-4 valid/n_events fields), and the 24L lambda=1
training evals (train_highbeta results). Prints only what exists.

    python experiments/round4_report.py [--dir artifacts/round4]
"""
import argparse
import json
import os

FINETUNES = [  # (file, label)
    ("ftb8_from_ftb6.json", "beta=8 FM fine-tune from ftb6"),
    ("ftb8_from_parent.json", "beta=8 FM fine-tune from pure-KL parent"),
    ("ftb9_from_ftb6.json", "beta=9 FM fine-tune from ftb6"),
    ("l1_24l_ftb6_s7.json", "24L lambda=1 s7 + ftb6 fine-tune"),
    ("l1_24l_ftb6_s8.json", "24L lambda=1 s8 + ftb6 fine-tune"),
    ("ferm_24l_ftb6_s7.json", "24L ferm-aware s7 + ftb6 fine-tune"),
]

SCANS = [
    ("probe_L32b9_ft2.json", "32^2 beta=9 FT hardening"),
    ("probe_L32b9_plain_n10.json", "32^2 beta=9 plain n10"),
    ("probe_L32b9_plain_n12ext.json", "32^2 beta=9 plain n12 ext"),
    ("probe_L64b8_ft_tau.json", "64^2 beta=8 FT tau axis"),
    ("probe_L64b8_ft_tau2.json", "64^2 beta=8 FT tau=2"),
    ("schw_b8_ftb8_ab.json", "16^2 beta=8 fine-tune A/B"),
    ("schw_b9_ftb9_ab.json", "16^2 beta=9 fine-tune A/B"),
    ("l1_24l_schw_b6_ab.json", "16^2 beta=6 24L-lambda A/B"),
    ("ferm_ab_l32b9.json", "32^2 beta=9 ferm-aware A/B"),
    ("ferm_16b9.json", "16^2 beta=9 ferm-aware probe"),
    ("ferm_16b6.json", "16^2 beta=6 ferm-aware vs ftb6 paired A/B"),
    ("ferm_ab_l32b8.json", "32^2 beta=8 ferm-aware A/B"),
]

TRAINS = [
    ("train24l_fw10_s7.json", "24L lambda=1 seed 7"),
    ("train24l_fw10_s8.json", "24L lambda=1 seed 8"),
    ("train24l_ferm_s7.json", "24L ferm-aware seed 7"),
    ("l1_24l_evalb7.json", "24L lambda=1 s7 @ beta=7 capacity"),
]


def show_finetune(path, label):
    d = json.load(open(path))
    print(f"-- {label} ({os.path.basename(path)})")
    before, after = d.get("acc_before", {}), d.get("acc_after", {})
    for n in sorted(set(before) | set(after), key=int):
        b = before.get(n, {}).get("acc", float("nan"))
        a = after.get(n, {}).get("acc", float("nan"))
        print(f"   nstep {n:>3}: acc {b:.3f} -> {a:.3f}")
    if "force_loss_first" in d:
        print(f"   force loss {d['force_loss_first']:.2f} -> "
              f"{d['force_loss_final']:.2f}")


def show_scan(path, label):
    d = json.load(open(path))
    B = d["args"]["chains"]
    print(f"-- {label} ({os.path.basename(path)}, B={B})")
    for r in d["rows"]:
        rate = B * r["q_mobility"] / r["s_per_traj"]
        nev = r.get("n_events",
                    r["q_mobility"] * d["args"]["ntraj"] * B)
        flag = "" if r.get("valid", True) else "  [BELOW FLOOR]"
        print(f"   {r['sampler']:>5} tau={r['tau_used']:g} n{r['nstep']:<3}"
              f" {str(r.get('ckpt') or ''):>44.44}"
              f" acc={r['acc']:.3f} mob/s={rate:.3e}"
              f" ({nev:.0f} ev){flag}")


def show_train(path, label):
    d = json.load(open(path))
    print(f"-- {label} ({os.path.basename(path)})")
    if "train" in d:
        t = d["train"]
        print(f"   wall {t.get('wall_s', 0):.0f}s  ess {t.get('ess_final')}"
              f"  dkl {t.get('dkl_final')}")
    for n, row in sorted(d.get("fthmc", {}).items(), key=lambda kv: int(kv[0])):
        print(f"   eval nstep {n:>3}: acc {row.get('acc', float('nan')):.3f}"
              f" plaq {row.get('plaq', float('nan')):.5f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="artifacts/round4")
    args = p.parse_args()
    for group, shower in ((SCANS, show_scan), (FINETUNES, show_finetune),
                          (TRAINS, show_train)):
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


if __name__ == "__main__":
    main()
