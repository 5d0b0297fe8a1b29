#!/usr/bin/env python
"""FT-HMC throughput vs chain-batch size (round 3).

Effective-samples/sec/chip scales linearly with the chain count as long as
s/traj grows sublinearly - this measures where the 24-layer rncp flow
saturates the chip at production (L, nstep). Cold start shared across B.

Usage:
  python experiments/chains_scaling.py --L 16 --beta 6 --tau 0.5 \
      --nstep 16 --batches 64 128 256 512 --out runs/chains_scaling_b6
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

from fthmc_tpu.checkpoint import load_checkpoint_auto
from fthmc_tpu.config import LeapfrogConfig
from fthmc_tpu.hmc import run_fthmc
from fthmc_tpu.models.flow import flow_reverse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/flow8x8_b3_rncp24")
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, default=6.0)
    p.add_argument("--tau", type=float, default=0.5)
    p.add_argument("--nstep", type=int, default=16)
    p.add_argument("--batches", type=int, nargs="+",
                   default=[64, 128, 256, 512])
    p.add_argument("--time-traj", type=int, default=64)
    p.add_argument("--time-reps", type=int, default=3)
    p.add_argument("--integrator", default="omelyan")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    state, meta, spec, _ = load_checkpoint_auto(args.ckpt)
    params = state.params
    lf = LeapfrogConfig(tau=args.tau, nstep=args.nstep)
    key = jax.random.PRNGKey(5150)
    results = {"args": vars(args), "points": []}
    for B in args.batches:
        z = flow_reverse(params, jnp.zeros((B, 2, args.L, args.L)), spec)[0]
        float(jnp.sum(z))
        key, kw = jax.random.split(key)
        # warm up: compile + move off the cold start a little
        z, _ = run_fthmc(params, spec, lf, beta=args.beta, ntraj=8, z0=z,
                         key=kw, integrator=args.integrator)
        float(jnp.sum(z))
        times = []
        for _ in range(args.time_reps):
            key, kk = jax.random.split(key)
            t0 = time.time()
            z, h = run_fthmc(params, spec, lf, beta=args.beta,
                             ntraj=args.time_traj, z0=z, key=kk,
                             integrator=args.integrator)
            float(jnp.sum(z))
            times.append((time.time() - t0) / args.time_traj)
        r = {"chains": B, "s_per_traj": min(times),
             "chain_traj_per_s": B / min(times),
             "acc": float(np.asarray(h.acc).mean())}
        results["points"].append(r)
        print(json.dumps(r), flush=True)
        with open(os.path.join(args.out, "scan.json"), "w") as f:
            json.dump(results, f, indent=1)
    print("done ->", args.out, flush=True)


if __name__ == "__main__":
    main()
