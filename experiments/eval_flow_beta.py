#!/usr/bin/env python
"""Evaluate a trained flow artifact for FT-HMC at an arbitrary (L, beta):
acceptance scan over nstep, then optional tau_int(Q) head-to-head vs plain
HMC at the SAME (L, beta).

Round-2 motivation: flows annealed to beta >= 4 get leapfrog-rugged as KL
training progresses (measured: |dH|@nstep256 48 -> 104 from 15k -> 80k
steps at beta=4 while ESS improved 0.06 -> 0.07), so the best FT-HMC flow
for beta_target may be one trained at a LOWER beta (partial trivialization:
smoothness beats adaptation). This script measures that trade-off.

Usage:
  python experiments/eval_flow_beta.py --ckpt artifacts/flow8x8_b3_rncp24 \
    --coupling rncp --n-mixture 8 --n-layers 24 --hidden 32 32 --s-clip 3 \
    --L 16 --beta 4.0 --nsteps 256 384 512 --outdir runs/b3flow_at_b4
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.checkpoint import load_checkpoint
from fthmc_tpu.config import FlowSpec, HMCConfig, LeapfrogConfig, TrainConfig
from fthmc_tpu.hmc import run_fthmc_chunked, run_hmc
from fthmc_tpu.observables import tau_int
from fthmc_tpu.train import init_train_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--coupling", default="rncp")
    p.add_argument("--n-mixture", type=int, default=8)
    p.add_argument("--n-layers", type=int, default=24)
    p.add_argument("--hidden", type=int, nargs="+", default=[32, 32])
    p.add_argument("--activation", default="silu")
    p.add_argument("--s-clip", type=float, default=3.0)
    p.add_argument("--n-knots", type=int, default=8)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, required=True)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--nsteps", type=int, nargs="+", default=[256, 384, 512])
    p.add_argument("--integrator", default="omelyan")
    p.add_argument("--eval-chains", type=int, default=64)
    p.add_argument("--eval-ntraj", type=int, default=96)
    p.add_argument("--tauint-ntraj", type=int, default=0,
                   help="if >0, run the head-to-head at the best nstep")
    p.add_argument("--hmc-ntraj", type=int, default=8192,
                   help="plain-HMC baseline length (cheap; needs >> tau_int"
                        " which can be ~100 at beta=5)")
    p.add_argument("--hmc-nstep", type=int, default=32)
    p.add_argument("--hmc-chains", type=int, default=128)
    p.add_argument("--acc-floor", type=float, default=0.35)
    p.add_argument("--force-backend", default="auto")
    p.add_argument("--block", type=int, default=16,
                   help="trajectories per compiled device execution (the "
                        "remote worker dies on executions > ~5 min; shrink "
                        "for large L)")
    p.add_argument("--grad-clip", type=float, default=1.0,
                   help="must match the artifact's training config so the "
                        "checkpoint's opt_state tree structure restores")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--outdir", required=True)
    args = p.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    # self-describing checkpoints carry their own FlowSpec; the
    # architecture flags are only a fallback for legacy dirs
    from fthmc_tpu.checkpoint import load_checkpoint_auto
    found = load_checkpoint_auto(args.ckpt)
    if found is not None:
        state, meta, spec, _ = found
        print(f"loaded {args.ckpt} spec={spec}", flush=True)
    else:
        spec = FlowSpec(n_layers=args.n_layers, coupling=args.coupling,
                        n_mixture=args.n_mixture, n_knots=args.n_knots,
                        hidden_sizes=tuple(args.hidden),
                        activation=args.activation, s_clip=args.s_clip)
        # template state at the TRAINING lattice size is not needed: params
        # are L-independent, restore against an L=8 template.
        state = init_train_state(jax.random.PRNGKey(0),
                                 TrainConfig(L=8, beta=args.beta, flow=spec,
                                             grad_clip=args.grad_clip))
        state, meta = load_checkpoint(args.ckpt, state)
        print(f"loaded {args.ckpt} meta={meta}", flush=True)

    key = jax.random.PRNGKey(args.seed)
    z0 = lattice.hot_start(key, args.eval_chains, args.L)
    results = {"args": vars(args)}
    results["fthmc"] = {}
    best = None
    for nstep in args.nsteps:
        lf = LeapfrogConfig(tau=args.tau, nstep=nstep)
        key, krun = jax.random.split(key)
        t0 = time.time()
        z, h = run_fthmc_chunked(state.params, spec, lf, beta=args.beta,
                                 ntraj=args.eval_ntraj, z0=z0, key=krun,
                                 block=args.block, integrator=args.integrator,
                                 force_backend=args.force_backend)
        jax.block_until_ready(z)
        wall = time.time() - t0
        t = args.eval_ntraj // 4
        r = {"acc": float(np.asarray(h.acc)[t:].mean()),
             "plaq": float(np.asarray(h.plaq)[t:].mean()),
             "exp_mdh": float(np.asarray(h.exp_mdh)[t:].mean()),
             "abs_dh": float(np.abs(np.asarray(h.dh)[t:]).mean()),
             "s_per_traj": wall / args.eval_ntraj}
        results["fthmc"][str(nstep)] = r
        print(f"FT-HMC L={args.L} beta={args.beta} nstep={nstep}: "
              f"acc={r['acc']:.3f} plaq={r['plaq']:.5f} "
              f"|dH|={r['abs_dh']:.3f} "
              f"exact={lattice.PLAQ_EXACT.get(args.beta)}", flush=True)
        if r["acc"] > args.acc_floor and best is None:
            best = nstep

    if best is not None and args.tauint_ntraj > 0:
        ntraj = args.tauint_ntraj
        lf = LeapfrogConfig(tau=args.tau, nstep=best)
        key, k1, k2 = jax.random.split(key, 3)
        z, h = run_fthmc_chunked(state.params, spec, lf, beta=args.beta,
                                 ntraj=ntraj, z0=z0, key=k1,
                                 block=max(args.block, 16),
                                 integrator=args.integrator,
                                 force_backend=args.force_backend)
        q_ft = np.asarray(h.q)[ntraj // 4:]
        # plain-HMC baseline: decoupled length/chains (the plain force is
        # ~1000x cheaper, and tau_int(Q) can be ~100 at beta=5 - it needs
        # far more trajectories than the FT side, where tau_int ~ O(1)).
        hcfg = HMCConfig(beta=args.beta, L=args.L, tau=args.tau,
                         nstep=args.hmc_nstep, ntraj=args.hmc_ntraj,
                         n_chains=args.hmc_chains, randinit=True)
        x, hh = run_hmc(hcfg, key=k2)
        q_h = np.asarray(hh.q)[args.hmc_ntraj // 4:]
        ti_ft = float(np.mean([tau_int(q_ft[:, c])
                               for c in range(q_ft.shape[1])]))
        ti_h = float(np.mean([tau_int(q_h[:, c])
                              for c in range(q_h.shape[1])]))
        results["tau_int"] = {
            "nstep": best, "ntraj": ntraj, "fthmc": ti_ft, "hmc": ti_h,
            "hmc_ntraj": args.hmc_ntraj, "hmc_nstep": args.hmc_nstep,
            "hmc_chains": args.hmc_chains,
            "speedup": ti_h / ti_ft,
            "chi_q_fthmc": float(np.mean(q_ft ** 2)),
            "chi_q_hmc": float(np.mean(q_h ** 2)),
            "acc_fthmc": float(np.asarray(h.acc)[ntraj // 4:].mean()),
            "acc_hmc": float(np.asarray(hh.acc)[args.hmc_ntraj // 4:].mean()),
        }
        print("tau_int:", json.dumps(results["tau_int"], indent=1),
              flush=True)

    with open(os.path.join(args.outdir, "results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    print("done ->", args.outdir, flush=True)


if __name__ == "__main__":
    main()
