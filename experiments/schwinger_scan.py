#!/usr/bin/env python
"""Schwinger-model cost/acceptance scans (round-3 capstone setup).

Measures, on the real chip:
  (a) plain dynamical-HMC s/traj + acceptance vs nstep at the target
      (L, beta, mass) — the plain cost-optimum;
  (b) FT dynamical-HMC (pure-gauge beta=3 partial-trivialization flow)
      s/traj + acceptance vs nstep — does the flow still integrate with
      the fermion force in the loop, and at what cost;
  (c) Q-mobility per wall second for every point (the cheap screen the
      pure-gauge round-3 scans used).

Usage: python experiments/schwinger_scan.py --beta 5 --mass 0.1
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import fermion, lattice
from fthmc_tpu.checkpoint import load_checkpoint_auto
from fthmc_tpu.schwinger import (SchwingerConfig, run_hmc_dyn_chunked,
                                 run_fthmc_dyn_chunked)


def _sync(x):
    return float(jnp.sum(x))


def measure(run, ntraj, block, warmup=0):
    """Optionally run ``warmup`` trajectories first (compile + local
    thermalization, excluded from timing), then time ``ntraj`` more,
    chained through the warmed state."""
    x0 = None
    if warmup:
        x0, _ = run(warmup, block, None)
        _sync(x0)
    t0 = time.time()
    x, h = run(ntraj, block, x0)
    _sync(x)
    wall = time.time() - t0
    acc = float(np.asarray(h.acc)[ntraj // 4:].mean())
    e = float(np.asarray(h.exp_mdh)[ntraj // 4:].mean())
    p = float(np.asarray(h.plaq)[ntraj // 4:].mean())
    q = np.asarray(h.q)[ntraj // 4:]
    dq = np.abs(np.diff(q, axis=0))
    mob = float(dq.mean())
    return {"acc": acc, "exp_mdh": e, "plaq": p, "q_mobility": mob,
            "wall_s": wall, "s_per_traj": wall / ntraj,
            "mob_per_s": mob * ntraj / wall}


def load_state_z(path, chains):
    """Thermalized start from a production run_state.npz (first ``chains``
    chains; tiles if the saved batch is smaller)."""
    z = np.load(path)["z"]
    if z.shape[0] < chains:
        reps = -(-chains // z.shape[0])
        z = np.tile(z, (reps, 1, 1, 1))
    return jnp.asarray(z[:chains])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, default=5.0)
    p.add_argument("--mass", type=float, default=0.1)
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--ntraj", type=int, default=192)
    p.add_argument("--block", type=int, default=48)
    p.add_argument("--ckpt", default="artifacts/flow8x8_b3_rncp24")
    p.add_argument("--plain-nsteps", type=int, nargs="*",
                   default=[8, 16, 24])
    p.add_argument("--ft-nsteps", type=int, nargs="+",
                   default=[8, 12, 16, 24])
    p.add_argument("--tau", type=float, default=0.5)
    p.add_argument("--plain-state", default=None,
                   help="run_state.npz for a thermalized plain start")
    p.add_argument("--ft-state", default=None,
                   help="run_state.npz for a thermalized FT (latent) start")
    p.add_argument("--warmup-traj", type=int, default=0,
                   help="untimed trajectories per row (compile + re-therm)")
    p.add_argument("--out", default="runs/schwinger_scan")
    p.add_argument("--cg-backend", choices=["xla", "fused"],
                   default="xla",
                   help="fermion CG operator backend (fused = Pallas VMEM\n                   kernel, ops/pallas_fermion.py)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    fermion.set_cg_backend(args.cg_backend)

    state, meta, spec, _ = load_checkpoint_auto(args.ckpt)
    params = state.params
    print(f"flow: {spec}", flush=True)

    results = {"args": vars(args), "plain": [], "ft": []}

    z_plain = (load_state_z(args.plain_state, args.chains)
               if args.plain_state else None)
    z_ft = (load_state_z(args.ft_state, args.chains)
            if args.ft_state else None)

    for nstep in args.plain_nsteps:
        cfg = SchwingerConfig(L=args.L, beta=args.beta, mass=args.mass,
                              tau=args.tau, nstep=nstep,
                              n_chains=args.chains, ntraj=args.ntraj)
        key = jax.random.PRNGKey(100 + nstep)

        def run(n, b, x0, cfg=cfg, key=key):
            c = dataclasses.replace(cfg, ntraj=n)
            return run_hmc_dyn_chunked(
                c, block=b, key=key, x0=z_plain if x0 is None else x0)
        r = measure(run, args.ntraj, args.block, args.warmup_traj)
        r["nstep"] = nstep
        results["plain"].append(r)
        print(f"plain nstep={nstep}: {json.dumps(r)}", flush=True)
        with open(os.path.join(args.out, "scan.json"), "w") as f:
            json.dump(results, f, indent=1)

    for nstep in args.ft_nsteps:
        cfg = SchwingerConfig(L=args.L, beta=args.beta, mass=args.mass,
                              tau=args.tau, nstep=nstep,
                              n_chains=args.chains, ntraj=args.ntraj)
        key = jax.random.PRNGKey(200 + nstep)

        def run(n, b, z0, cfg=cfg, key=key):
            c = dataclasses.replace(cfg, ntraj=n)
            return run_fthmc_dyn_chunked(
                params, spec, c, block=b, key=key,
                z0=z_ft if z0 is None else z0)
        r = measure(run, args.ntraj, args.block, args.warmup_traj)
        r["nstep"] = nstep
        results["ft"].append(r)
        print(f"FT    nstep={nstep}: {json.dumps(r)}", flush=True)
        with open(os.path.join(args.out, "scan.json"), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
