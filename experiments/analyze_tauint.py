#!/usr/bin/env python
"""Post-hoc tau_int(Q) analysis with chain-bootstrap error bars.

Reads the Q history persisted by experiments/tauint_run.py
(run_state.npz: q is (ntraj, chains)) or a plain_tauint/eval history, and
reports tau_int(Q) as mean +/- bootstrap stderr over chains, plus chi_Q
with the same treatment. Per-chain tau_int estimates are independent (the
chains are), so the bootstrap over chains is the honest error for the
chain-averaged estimator.

Usage: python experiments/analyze_tauint.py runs/tauint_b4ft/run_state.npz \
           --therm-frac 0.25
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fthmc_tpu.observables import tau_int


def chain_stats(q: np.ndarray, n_boot: int = 400, seed: int = 0):
    """q: (ntraj, chains). Returns dict with tau_int / chi_q mean + err."""
    nchain = q.shape[1]
    ti = np.array([tau_int(q[:, c]) for c in range(nchain)])
    chi = (q ** 2).mean(axis=0)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, nchain, size=(n_boot, nchain))
    ti_b = ti[idx].mean(axis=1)
    chi_b = chi[idx].mean(axis=1)
    dq2 = np.mean((q[1:] - q[:-1]) ** 2)   # topological mobility at dt=1
    return {
        "tau_int_q": float(ti.mean()),
        "tau_int_q_err": float(ti_b.std(ddof=1)),
        "chi_q": float(chi.mean()),
        "chi_q_err": float(chi_b.std(ddof=1)),
        "q_mobility_dt1": float(dq2),      # windowing-free cross-check
        "n_chains": int(nchain),
        "ntraj_used": int(q.shape[0]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("npz", help="run_state.npz (q: (ntraj, chains))")
    p.add_argument("--therm-frac", type=float, default=0.25)
    p.add_argument("--key", default="q")
    args = p.parse_args()
    data = np.load(args.npz)
    q = np.asarray(data[args.key])
    therm = int(q.shape[0] * args.therm_frac)
    res = chain_stats(q[therm:])
    res["therm"] = therm
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
