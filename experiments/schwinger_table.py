#!/usr/bin/env python
"""Assemble the Schwinger-model plain-vs-FT wall-clock ladder (BENCH.md
round-3 Schwinger section) from the committed measurement artifacts.

    python experiments/schwinger_table.py [--dir artifacts/round3]

eff-samples/s/chip = n_chains / (2 * tau_int(Q) * s_per_traj).

tau_int comes from the longest (most converged) production chain per
row. s_per_traj = min over available timing sources: the chain's own
in-run wall (conservative: includes block/persist overhead), the
stage-8c/8d re-timed equilibrium rows, and the stage-9 equilibrium
probes (warm-started mts-scan rows on the shipped code) — all at the
row's exact (sampler, nstep, tau).

Rows with no affordable direct chain (plain at beta=8 needs ~1M
trajectories) are ESTIMATED from the calibrated mobility relation
tau ~ r * chi_Q / mobility with r = 1.9 +- 0.2 (the >=30-tau-chain
calibration, experiments/mobility_relation.py); chi_Q is taken from the
most-converged chain at the point (sampler-independent, validated on
every direct pair) and mobility from a dedicated equilibrium mobility
chain at the row's config. Estimated rows are flagged 'est' and carry
the r band as their systematic.
"""
import argparse
import json
import os

R_BAND = (1.7, 1.9, 2.1)   # mobility-relation coefficient (lo, mid, hi)


# ---- verdict arithmetic (pure; tested in tests/test_ladder_math.py) ----

def eff_per_s(n_chains, tau_int, s_per_traj):
    """Effective topological samples per wall-second for a chain row."""
    return n_chains / (2.0 * tau_int * s_per_traj)


def mobility_rate(row, n_chains, ntraj):
    """(B*mob/s, counting rel-err, n_events) for an equilibrium probe row.

    Counting statistics: ~1 unit of |dQ|^2 per tunneling event, so
    N_events ~ mob/traj * ntraj * B and the relative error is
    N_events^-1/2. Rows written by the round-4 harness carry their exact
    timed-trajectory count (auto-extension makes args.ntraj a floor, not
    the truth)."""
    rate = n_chains * row["q_mobility"] / row["s_per_traj"]
    ntraj = row.get("ntraj_timed", ntraj)
    nev = max(row.get("n_events",
                      row["q_mobility"] * ntraj * n_chains), 1e-9)
    return rate, nev ** -0.5, nev


def relation_tau_band(chi_q, mobility, r_band=R_BAND):
    """tau_int band from the calibrated mobility relation
    tau ~ r * chi_Q / mobility (r = 1.9 +- 0.2 on >=30-tau chains)."""
    return [r * chi_q / mobility for r in r_band]


def ratio_verdict(ft, plain):
    """Verdict from two (value, rel_err) pairs: (who, factor, FT/plain
    ratio, rel_err of the ratio). rel errs combine in quadrature."""
    ratio = ft[0] / plain[0]
    rel = (ft[1] ** 2 + plain[1] ** 2) ** 0.5
    who = "FT" if ratio > 1 else "plain"
    return who, (ratio if ratio > 1 else 1.0 / ratio), ratio, rel


def chain_verdict(best_ft, best_plain):
    """Verdict from two (eff, abs_err) pairs: (who, factor, FT/plain
    ratio, abs_err of the ratio)."""
    ratio = best_ft[0] / best_plain[0]
    err = ratio * ((best_plain[1] / best_plain[0]) ** 2
                   + (best_ft[1] / best_ft[0]) ** 2) ** 0.5
    who = "FT" if ratio > 1 else "plain"
    return who, (ratio if ratio > 1 else 1.0 / ratio), ratio, err

# point -> list of row dicts:
#   chain: direct tau_int artifact
#   est:   (mobility artifact, chi_Q artifact) for a relation-estimated row
POINTS = [
    ("16m01b4", dict(L=16, beta=4), [
        dict(s="plain", note="tau=2 n8 B=128", nstep=8, tau=2.0,
             chain="schwinger_b4_plain_t2n8.json"),
        dict(s="FT", note="ftb6 t=.5 n8", nstep=8, tau=0.5,
             chain="schwinger_b4_ft_ftb6_t05n8.json"),
    ]),
    ("16m01b5", dict(L=16, beta=5), [
        dict(s="plain", note="tau=2 n8 B=128", nstep=8, tau=2.0,
             chain="schwinger_b5_plain_t2n8.json"),
        dict(s="FT", note="ftb6 t=.5 n8", nstep=8, tau=0.5,
             chain="schwinger_b5_ft_ftb6_t05n8.json"),
    ]),
    ("16m01b6", dict(L=16, beta=6), [
        dict(s="plain", note="tau=2 n8 B=128", nstep=8, tau=2.0,
             chain="schwinger_b6_plain_t2n8.json"),
        dict(s="plain", note="tau=2 n10 B=128", nstep=10, tau=2.0,
             chain="schwinger_b6_plain_t2n10.json"),
        dict(s="FT", note="ftb6 t=.5 n4", nstep=4, tau=0.5,
             chain="schwinger_b6_ft_ftb6_t05n4.json"),
    ]),
    ("16m01b7", dict(L=16, beta=7), [
        dict(s="plain", note="tau=2 n8 B=128 (36t)", nstep=8, tau=2.0,
             chain="schwinger_b7_plain_t2n8_40tau.json"),
        dict(s="plain", note="tau=2 n10 B=128", nstep=10, tau=2.0,
             chain="schwinger_b7_plain_t2n10.json"),
        dict(s="FT", note="ftb6 t=.5 n4 (42t)", nstep=4, tau=0.5,
             chain="schwinger_b7_ft_ftb6_t05n4_40tau.json"),
    ]),
    ("16m01b8", dict(L=16, beta=8), [
        dict(s="plain", note="tau=2 n10 B=128 EST", nstep=10, tau=2.0,
             est=("schwinger_b8_plain_mobility_n10.json",
                  "schwinger_b8_ft_ftb6_t05n4_ext.json")),
        dict(s="plain", note="tau=2 n8 B=128 EST", nstep=8, tau=2.0,
             est=("schwinger_b8_plain_mobility.json",
                  "schwinger_b8_ft_ftb6_t05n4_ext.json")),
        dict(s="FT", note="ftb6 t=.5 n4", nstep=4, tau=0.5,
             chain="schwinger_b8_ft_ftb6_t05n4_ext.json"),
    ]),
    ("32m01b6", dict(L=32, beta=6), [
        dict(s="plain", note="tau=2 n16 B=64 (79t)", nstep=16, tau=2.0,
             chain="schwinger_L32_b6_plain_t2n16.json"),
        dict(s="plain", note="tau=2 n10 B=64", nstep=10, tau=2.0,
             chain="schwinger_L32_b6_plain_t2n10.json"),
        # 26-tau chain reads tau 25-30% low (this repo's own convergence
        # study) -> printed for the record, excluded from the verdict
        dict(s="FT", note="ftb6 t=.5 n6 (26t)", nstep=6, tau=0.5,
             chain="schwinger_L32_b6_ft_t05n6_ext.json", superseded=True),
        dict(s="FT", note="ftb6 t=.5 n6 fresh", nstep=6, tau=0.5,
             chain="schwinger_L32_b6_ft_t05n6_ext2.json"),
    ]),
    ("64m01b6", dict(L=64, beta=6), [
        # short first chains: superseded by the stage-10/10d extensions
        # once those land (excluded from the verdict if the ext exists)
        dict(s="plain", note="tau=2 n16 B=64 (18t)", nstep=16, tau=2.0,
             chain="schwinger_L64_b6_plain_t2n16.json",
             superseded_by="schwinger_L64_b6_plain_t2n16_ext.json"),
        dict(s="plain", note="tau=2 n16 B=64 ext", nstep=16, tau=2.0,
             chain="schwinger_L64_b6_plain_t2n16_ext.json"),
        dict(s="FT", note="ftb6 t=.5 n16 (15t)", nstep=16, tau=0.5,
             chain="schwinger_L64_b6_ft_t05n16.json",
             superseded_by="schwinger_L64_b6_ft_t05n16_ext.json"),
        dict(s="FT", note="ftb6 t=.5 n16 ext", nstep=16, tau=0.5,
             chain="schwinger_L64_b6_ft_t05n16_ext.json"),
    ]),
]

PROBES = {  # (L, beta) -> stage-9 equilibrium probe artifacts
    (32, 6): ["probe_L32_plain.json", "probe_L32_ft.json"],
    (16, 8): ["probe_b8_plain.json", "probe_b8_ft.json"],
    (16, 7): ["probe_b7_plain.json", "probe_b7_ft.json"],
    (16, 6): ["probe_b6_plain.json"],
    (64, 6): ["probe_L64_plain.json", "probe_L64_ft.json"],
}

# Rungs decided by a mobility PAIR alone: the wall-clock verdict ratio
# eff_FT/eff_plain = (B_FT*mob_FT/s_FT) / (B_plain*mob_plain/s_plain)
# is chi_Q- and r-free (both cancel between the two samplers at the same
# point), so a pair of equilibrium mobility probes extends the ladder a
# rung with NO convergence-length chain. No absolute eff/s is quoted.
MOBILITY_PAIRS = [  # (point, meta, [plain probe files], [ft probe files])
    ("16m01b7", dict(L=16, beta=7),
     ["probe_b7_plain.json"], ["probe_b7_ft.json"]),
    ("16m01b8", dict(L=16, beta=8),
     ["probe_b8_plain.json"], ["probe_b8_ft.json"]),
    ("16m01b9", dict(L=16, beta=9),
     ["probe_b9_plain.json", "probe_b9_plain_n12.json"],
     ["probe_b9_ft.json", "probe_b9_ft_n23.json"]),
    ("32m01b6", dict(L=32, beta=6),
     ["probe_L32_plain.json"], ["probe_L32_ft.json"]),
    ("32m01b8", dict(L=32, beta=8),
     ["probe_L32b8_plain.json"], ["probe_L32b8_ft.json"]),
    ("32m01b9", dict(L=32, beta=9),
     ["probe_L32b9_plain.json", "probe_L32b9_plain_n10.json",
      "probe_L32b9_plain_n12ext.json"],
     ["probe_L32b9_ft.json", "probe_L32b9_ft2.json"]),
    ("64m01b6", dict(L=64, beta=6),
     ["probe_L64_plain.json"], ["probe_L64_ft.json"]),
    ("64m01b8", dict(L=64, beta=8),
     ["probe_L64b8_plain.json"],
     ["probe_L64b8_ft.json", "probe_L64b8_ft_tau.json",
      "probe_L64b8_ft_tau2.json"]),
]



def _find(dirs, fname):
    """First existing path for fname across the artifact dirs (searched in
    order); falls back to the first dir's path (for 'missing' messages)."""
    for d in dirs:
        path = os.path.join(d, fname)
        if os.path.exists(path):
            return path
    return os.path.join(dirs[0], fname)

def load_retimes(dirs):
    """{(beta, sampler, nstep, tau, src): s_per_traj} from the stage-8c
    (xla) / stage-8d (fused) re-times — 16^2 rows only."""
    out = {}
    for beta in (4, 5, 6, 7):
        for backend, fname in (("xla", f"retime_b{beta}.json"),
                               ("fused", f"retime_b{beta}_fused.json")):
            path = _find(dirs, fname)
            if not os.path.exists(path):
                continue
            for r in json.load(open(path))["rows"]:
                sampler = "FT" if r["sampler"] == "ft" else "plain"
                key = (16, float(beta), sampler, r["nstep"],
                       float(r["tau_used"]))
                out.setdefault(key, {})[backend] = r["s_per_traj"]
    return out


def load_probes(dirs):
    """Same key -> {'probe': s_per_traj} from the stage-9 probes."""
    out = {}
    for (L, beta), files in PROBES.items():
        for fname in files:
            path = _find(dirs, fname)
            if not os.path.exists(path):
                continue
            for r in json.load(open(path))["rows"]:
                sampler = "FT" if r["sampler"] == "ft" else "plain"
                key = (L, float(beta), sampler, r["nstep"],
                       float(r["tau_used"]))
                out.setdefault(key, {})[
                    "probe"] = r["s_per_traj"]
    return out


def best_timing(timings, spt_run):
    cands = dict(timings or {})
    cands["run"] = spt_run
    src = min(cands, key=lambda k: cands[k] if cands[k] else 1e9)
    return cands[src], src


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", nargs="+",
                   default=["artifacts/round3", "artifacts/round4"],
                   help="artifact dirs, searched in order")
    p.add_argument("--min-events", type=float, default=50,
                   help="statistics floor for mobility-pair verdicts "
                        "(BENCH.md convergence lesson); rows below it or "
                        "flagged valid=false print but cannot decide a "
                        "rung. 0 = override (flagged as such).")
    args = p.parse_args()
    timings = load_retimes(args.dir)
    for k, v in load_probes(args.dir).items():
        timings.setdefault(k, {}).update(v)

    hdr = (f"{'point':>8} {'samp':>5} {'config':>22} {'acc':>6} "
           f"{'tau_int(Q)':>16} {'chi_Q':>14} {'s/traj':>12} "
           f"{'eff/s':>12}")
    print(hdr)
    for point, meta, rows in POINTS:
        effs = {}
        for row in rows:
            key = (meta["L"], float(meta["beta"]), row["s"],
                   row["nstep"], row["tau"])
            if "chain" in row:
                path = _find(args.dir, row["chain"])
                if not os.path.exists(path):
                    print(f"{point:>8} {row['s']:>5} {row['note']:>22}"
                          f"   -- missing: {row['chain']}")
                    continue
                r = json.load(open(path))
                spt, src = best_timing(timings.get(key), r["s_per_traj"])
                tau, terr = r["tau_int_q"], r["tau_int_q_err"]
                eff = eff_per_s(r["n_chains"], tau, spt)
                eeff = eff * terr / tau
                ntau = r.get("ntraj_used", 0) / tau
                dead = row.get("superseded") or (
                    row.get("superseded_by")
                    and os.path.exists(
                        _find(args.dir, row["superseded_by"])))
                print(f"{point:>8} {row['s']:>5} {row['note']:>22} "
                      f"{r['acc']:>6.3f} {tau:>9.1f}({terr:.1f})"
                      f"[{ntau:.0f}t] {r['chi_q']:>8.3f}({r['chi_q_err']:.3f})"
                      f" {spt:>8.4f}({src[0]}) {eff:>7.2f}({eeff:.2f})"
                      f"{' [superseded]' if dead else ''}")
                if not dead:
                    effs.setdefault(row["s"], []).append((eff, eeff))
            else:
                mob_f, chi_f = row["est"]
                mp, cp = (_find(args.dir, f) for f in (mob_f, chi_f))
                if not (os.path.exists(mp) and os.path.exists(cp)):
                    print(f"{point:>8} {row['s']:>5} {row['note']:>22}"
                          f"   -- missing: {mob_f} / {chi_f}")
                    continue
                m, c = json.load(open(mp)), json.load(open(cp))
                spt, src = best_timing(timings.get(key), m["s_per_traj"])
                taus = relation_tau_band(c["chi_q"], m["q_mobility_dt1"])
                eff = eff_per_s(m["n_chains"], taus[1], spt)
                lo = eff_per_s(m["n_chains"], taus[2], spt)
                hi = eff_per_s(m["n_chains"], taus[0], spt)
                print(f"{point:>8} {row['s']:>5} {row['note']:>22} "
                      f"{m['acc']:>6.3f} {taus[1]:>8.0f}"
                      f"[{taus[0]:.0f}-{taus[2]:.0f}] "
                      f"{c['chi_q']:>8.3f}({c['chi_q_err']:.3f})"
                      f" {spt:>8.4f}({src[0]}) {eff:>7.2f}[{lo:.2f}-{hi:.2f}]")
                effs.setdefault(row["s"], []).append((eff, (hi - lo) / 2))
        if effs.get("plain") and effs.get("FT"):
            who, x, ratio, err = chain_verdict(max(effs["FT"]),
                                               max(effs["plain"]))
            print(f"{'':>8} -> verdict: {who} x{x:.2f} (+-{err:.2f} on "
                  f"FT/plain={ratio:.2f})")
        print()

    for point, meta, plain_fs, ft_fs in MOBILITY_PAIRS:
        paths = {side: [p for p in (_find(args.dir, f) for f in fs)
                        if os.path.exists(p)]
                 for side, fs in (("plain", plain_fs), ("FT", ft_fs))}
        if not (paths["plain"] and paths["FT"]):
            print(f"{point:>8} mobility pair -- missing: "
                  f"{plain_fs} / {ft_fs}\n")
            continue
        best, excluded = {}, []
        for side, side_paths in paths.items():
            for path in side_paths:
                d = json.load(open(path))
                B, ntraj = d["args"]["chains"], d["args"]["ntraj"]
                for r in d["rows"]:
                    rate, rel, nev = mobility_rate(r, B, ntraj)
                    ok = (r.get("valid", True)
                          and nev >= args.min_events)
                    print(f"{point:>8} {side:>5} "
                          f"{'tau=%g n%d' % (r['tau_used'], r['nstep']):>22}"
                          f" {r['acc']:>6.3f} {'mob/s=%.3e' % rate:>16} "
                          f"(+-{100 * rel:.0f}% counting, {nev:.0f} events)"
                          f"{'' if ok else ' [below floor]'}")
                    if not ok:
                        excluded.append((side, rate))
                        continue
                    if side not in best or rate > best[side][0]:
                        best[side] = (rate, rel)
        if "plain" in best and "FT" in best:
            who, x, ratio, rel = ratio_verdict(best["FT"], best["plain"])
            print(f"{'':>8} -> mobility-ratio verdict (chi- and r-free): "
                  f"{who} x{x:.2f} (+-{100 * rel:.0f}% on "
                  f"FT/plain={ratio:.2f})")
        elif excluded:
            print(f"{'':>8} -> verdict WITHHELD: no row with >= "
                  f"{args.min_events:.0f} events on "
                  f"{[s for s in ('plain', 'FT') if s not in best]} "
                  f"(--min-events 0 to override)")
        print()


if __name__ == "__main__":
    main()
