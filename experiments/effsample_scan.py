#!/usr/bin/env python
"""Wall-clock-per-effective-sample optimization scan (round 3, VERDICT #1).

The round-2 production recipe ran FT-HMC at acc 0.95-0.97 (nstep=128
Omelyan at 16^2 beta>=6) - far above the Metropolis cost optimum. This
script measures, for a grid of (nstep, tau) at fixed (L, beta):

  - acceptance + exactness (exp(-dH)) on a short run,
  - in-scan wall time per batch trajectory (distinct inputs per repeat,
    scalar-transfer fence - the only timing this infra trusts),

and reports cost_per_indep_proxy ~ t_traj / acc * tau-normalization, the
cheap screen for which (nstep, tau) points deserve full tau_int runs
(experiments/tauint_run.py). Flow restores from a self-describing
checkpoint (--ckpt), default the flagship beta=3 rncp flow.

Usage:
  python experiments/effsample_scan.py --L 16 --beta 6 \
      --nsteps 32 48 64 96 128 --taus 1.0 --out runs/effscan_b6
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
from fthmc_tpu.checkpoint import load_checkpoint_auto
from fthmc_tpu.config import LeapfrogConfig
from fthmc_tpu.hmc import run_fthmc, run_fthmc_chunked
from fthmc_tpu.models.flow import flow_reverse


def sync(x):
    return float(jnp.sum(x))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/flow8x8_b3_rncp24")
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, required=True)
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--ntraj", type=int, default=256)
    p.add_argument("--nsteps", type=int, nargs="+",
                   default=[32, 48, 64, 96, 128])
    p.add_argument("--taus", type=float, nargs="+", default=[1.0])
    p.add_argument("--integrator", default="omelyan")
    p.add_argument("--block", type=int, default=32)
    p.add_argument("--time-reps", type=int, default=3)
    p.add_argument("--time-traj", type=int, default=16)
    p.add_argument("--pairs", nargs="+", default=None,
                   help="explicit tau:nstep points (e.g. 0.5:16 1.0:128); "
                        "overrides the --taus x --nsteps grid so one "
                        "process can scan a sparse set (fresh-process "
                        "compiles are expensive on this infra)")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    state, meta, spec, _ = load_checkpoint_auto(args.ckpt)
    print(f"flow: {spec.coupling} x{spec.n_layers} era={meta.get('era')}",
          flush=True)
    params = state.params

    # cold start (ordered phase) for beta >= 5, shared across all points so
    # differences are purely (nstep, tau)
    key = jax.random.PRNGKey(97)
    if args.beta >= 5.0:
        z0 = flow_reverse(
            params, jnp.zeros((args.chains, 2, args.L, args.L)), spec)[0]
    else:
        z0 = lattice.hot_start(key, args.chains, args.L)
    jax.block_until_ready(z0)

    if args.pairs:
        points = [(float(s.split(":")[0]), int(s.split(":")[1]))
                  for s in args.pairs]
    else:
        points = [(tau, nstep) for tau in args.taus
                  for nstep in args.nsteps]

    results = {"args": vars(args), "points": []}
    for tau, nstep in points:
            lf = LeapfrogConfig(tau=tau, nstep=nstep)
            key, krun, ktime = jax.random.split(key, 3)
            t0 = time.time()
            z, h = run_fthmc_chunked(
                params, spec, lf, beta=args.beta, ntraj=args.ntraj, z0=z0,
                key=krun, block=args.block, integrator=args.integrator)
            sync(z)
            wall_all = time.time() - t0
            t = args.ntraj // 4
            acc = float(np.asarray(h.acc)[t:].mean())
            # in-scan timing: the short-run wall above includes compile;
            # re-time with the compiled program, chaining state between reps
            times = []
            zz = z
            for _ in range(args.time_reps):
                ktime, kk = jax.random.split(ktime)
                t0 = time.time()
                zz, _h = run_fthmc(params, spec, lf, beta=args.beta,
                                   ntraj=args.time_traj, z0=zz, key=kk,
                                   integrator=args.integrator)
                sync(zz)
                times.append((time.time() - t0) / args.time_traj)
            t_traj = min(times)
            r = {
                "tau": tau, "nstep": nstep, "acc": acc,
                "plaq": float(np.asarray(h.plaq)[t:].mean()),
                "exp_mdh": float(np.asarray(h.exp_mdh)[t:].mean()),
                "abs_dh": float(np.abs(np.asarray(h.dh)[t:]).mean()),
                "q_mobility": float(np.mean(
                    (np.asarray(h.q)[t + 1:] - np.asarray(h.q)[t:-1]) ** 2)),
                "s_per_traj": t_traj,
                "chain_traj_per_s": args.chains / t_traj,
                # cheap screen: cost of one ACCEPTED tau-unit of MD time
                "cost_proxy": t_traj / max(acc, 1e-3) / tau,
                "wall_s": wall_all,
            }
            results["points"].append(r)
            print(json.dumps(r), flush=True)
            with open(os.path.join(args.out, "scan.json"), "w") as f:
                json.dump(results, f, indent=1)
    print("done ->", args.out, flush=True)


if __name__ == "__main__":
    main()
