#!/usr/bin/env python
"""Post-hoc tau_int(Q) analysis with chain-bootstrap error bars.

Thin CLI over fthmc_tpu.observables.chain_stats (the statistics were
promoted into the tested package in round 3). Reads the Q history persisted
by experiments/tauint_run.py (run_state.npz: q is (ntraj, chains)) or a
plain_tauint/eval history.

Usage: python experiments/analyze_tauint.py runs/tauint_b4ft/run_state.npz \
           --therm-frac 0.25
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fthmc_tpu.observables import chain_stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("npz", help="run_state.npz (q: (ntraj, chains))")
    p.add_argument("--therm-frac", type=float, default=0.25)
    p.add_argument("--key", default="q")
    args = p.parse_args()
    data = np.load(args.npz)
    q = np.asarray(data[args.key])
    res = chain_stats(q, therm_frac=args.therm_frac)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
