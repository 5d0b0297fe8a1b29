#!/usr/bin/env python
"""Clean in-scan timing + chain-batch scaling for the Schwinger samplers.

Run AFTER the tau_int production runs, on an idle chip, starting from their
persisted equilibrated states (runs/<dir>/run_state.npz) so CG iteration
counts reflect equilibrium conditioning. Chains are tiled+jittered to reach
larger batches (identical cost profile for timing).

Output: runs/<out>/timing.json with s/traj per (sampler, nstep, B).
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
from fthmc_tpu.schwinger import (SchwingerConfig, _run_fthmc_dyn_scan,
                                 _run_hmc_dyn_scan)


def tile_state(z, B):
    reps = (B + z.shape[0] - 1) // z.shape[0]
    out = jnp.tile(z, (reps, 1, 1, 1))[:B]
    jitter = 0.01 * jax.random.normal(jax.random.PRNGKey(17), out.shape)
    return out + jitter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--state", required=True,
                   help="run_state.npz from a production run")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, default=5.0)
    p.add_argument("--mass", type=float, default=0.1)
    p.add_argument("--tau", type=float, default=0.5)
    p.add_argument("--nsteps", type=int, nargs="+", default=[24])
    p.add_argument("--batches", type=int, nargs="+", default=[64, 128, 256])
    p.add_argument("--ntraj", type=int, default=96)
    p.add_argument("--no-eo", action="store_true")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    z_base = jnp.asarray(np.load(args.state)["z"])
    ft = args.ckpt is not None
    if ft:
        state_f, _, spec, _ = load_checkpoint_auto(args.ckpt)
        params = state_f.params

    rows = []
    for nstep in args.nsteps:
        for B in args.batches:
            cfg = SchwingerConfig(L=args.L, beta=args.beta, mass=args.mass,
                                  tau=args.tau, nstep=nstep, n_chains=B,
                                  ntraj=args.ntraj,
                                  eo_precond=not args.no_eo)
            z = tile_state(z_base, B)
            key = jax.random.PRNGKey(1000 + nstep * 10 + B)
            # warmup (compile + one block), then timed block chained
            # through state (dedup-safe: different inputs)
            runner = ((lambda k, zz, n: _run_fthmc_dyn_scan(
                params, spec, k, zz, cfg, n)) if ft else
                (lambda k, zz, n: _run_hmc_dyn_scan(k, zz, cfg, n)))
            k1, k2 = jax.random.split(key)
            z1, h1 = runner(k1, z, args.ntraj)
            float(jnp.sum(z1))
            t0 = time.time()
            z2, h2 = runner(k2, z1, args.ntraj)
            float(jnp.sum(z2))
            wall = time.time() - t0
            row = {"sampler": "ft" if ft else "plain", "nstep": nstep,
                   "B": B, "tau": args.tau,
                   "s_per_traj": wall / args.ntraj,
                   "chain_traj_per_s": B * args.ntraj / wall,
                   "acc": float(np.asarray(h2.acc).mean()),
                   "eo": not args.no_eo}
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(os.path.join(args.out, "timing.json"), "w") as f:
                json.dump({"args": vars(args), "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
