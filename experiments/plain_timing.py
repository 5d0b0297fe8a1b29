#!/usr/bin/env python
"""Plain-HMC in-scan wall timing + short acceptance scan over nstep.

The plain side of the wall-clock-per-effective-sample table (round 3,
VERDICT #1): s/traj for the whole chain batch, measured in-scan with
chained state between reps and a scalar fence. Also screens whether the
plain baseline's own nstep is over-provisioned (acc 0.97 at nstep=32 in
the round-2 runs).

Usage:
  python experiments/plain_timing.py --L 16 --beta 6 --chains 128 \
      --nsteps 8 16 32 --out runs/plain_timing_b6
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.config import HMCConfig
from fthmc_tpu.hmc import run_hmc


def sync(x):
    return float(jnp.sum(x))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, required=True)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--chains", type=int, default=128)
    p.add_argument("--nsteps", type=int, nargs="+", default=[8, 16, 32])
    p.add_argument("--ntraj", type=int, default=2048)
    p.add_argument("--time-traj", type=int, default=1024)
    p.add_argument("--time-reps", type=int, default=3)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    results = {"args": vars(args), "points": []}
    key = jax.random.PRNGKey(31)
    for nstep in args.nsteps:
        cfg = HMCConfig(beta=args.beta, L=args.L, tau=args.tau, nstep=nstep,
                        ntraj=args.ntraj, n_chains=args.chains,
                        randinit=args.beta < 5.0, seed=5)
        key, krun, ktime = jax.random.split(key, 3)
        x, h = run_hmc(cfg, key=krun)
        sync(x)
        t = args.ntraj // 4
        acc = float(np.asarray(h.acc)[t:].mean())
        times = []
        xx = x
        import dataclasses
        tcfg = dataclasses.replace(cfg, ntraj=args.time_traj)
        for _ in range(args.time_reps):
            ktime, kk = jax.random.split(ktime)
            t0 = time.time()
            xx, _h = run_hmc(tcfg, x0=xx, key=kk)
            sync(xx)
            times.append((time.time() - t0) / args.time_traj)
        q = np.asarray(h.q)[t:]
        r = {"nstep": nstep, "acc": acc,
             "plaq": float(np.asarray(h.plaq)[t:].mean()),
             "exp_mdh": float(np.asarray(h.exp_mdh)[t:].mean()),
             "q_mobility": float(np.mean((q[1:] - q[:-1]) ** 2)),
             "s_per_traj": min(times),
             "chain_traj_per_s": args.chains / min(times)}
        results["points"].append(r)
        print(json.dumps(r), flush=True)
        with open(os.path.join(args.out, "scan.json"), "w") as f:
            json.dump(results, f, indent=1)
    print("done ->", args.out, flush=True)


if __name__ == "__main__":
    main()
