#!/usr/bin/env python
"""Plain-HMC tau_int(Q) baseline at (L, beta): cheap (analytic force), used
as the denominator of the FT-HMC decorrelation speedup. Long chains are
needed because tau_int(Q) grows fast with beta (~97 at 16^2 beta=5)."""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fthmc_tpu.config import HMCConfig
from fthmc_tpu.hmc import run_hmc_chunked


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, required=True)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--nstep", type=int, default=32)
    p.add_argument("--chains", type=int, default=128)
    p.add_argument("--ntraj", type=int, default=16384)
    p.add_argument("--therm-frac", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=77)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = HMCConfig(beta=args.beta, L=args.L, tau=args.tau,
                    nstep=args.nstep, ntraj=args.ntraj,
                    n_chains=args.chains, randinit=True, seed=args.seed)
    t0 = time.time()
    x, h = run_hmc_chunked(cfg, block=4096)
    jax.block_until_ready(x)
    therm = int(args.ntraj * args.therm_frac)
    q = np.asarray(h.q)[therm:]
    from fthmc_tpu.observables import chain_stats
    res = {
        "config": vars(args),
        "acc": float(np.asarray(h.acc)[therm:].mean()),
        "plaq": float(np.asarray(h.plaq)[therm:].mean()),
        "exp_mdh": float(np.asarray(h.exp_mdh)[therm:].mean()),
        "wall_s": time.time() - t0,
        **chain_stats(q),
    }
    np.savez_compressed(os.path.join(args.out, "hmc_q.npz"), q=q)
    print("plain HMC:", json.dumps(res, indent=1, default=str), flush=True)
    with open(os.path.join(args.out, "hmc_results.json"), "w") as f:
        json.dump(res, f, indent=2, default=str)


if __name__ == "__main__":
    main()
