#!/usr/bin/env python
"""Resilient long FT-HMC production run for tau_int(Q) (16^2, beta >= 3).

Thin harness over fthmc_tpu.runner.run_resilient (block + persist +
resume + watchdog): the remote TPU worker dies on single executions
longer than ~5 minutes (round-1 infra note), so the chain advances in
SMALL compiled blocks (~1-2 min of device time), persists (z, q history)
after every block, and retries a block on worker errors/hangs - a crash
costs one block, not the run.
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
from fthmc_tpu.checkpoint import find_and_load_checkpoint
from fthmc_tpu.config import FlowSpec, LeapfrogConfig, TrainConfig
from fthmc_tpu.hmc import run_fthmc
from fthmc_tpu.observables import chain_stats
from fthmc_tpu.runner import run_resilient
from fthmc_tpu.train import init_train_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="runs/b3_rncp8_t8_stable/checkpoints")
    p.add_argument("--out", default="runs/tauint_b3")
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, default=3.0)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--nstep", type=int, default=256)
    p.add_argument("--integrator", default="omelyan")
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--ntraj", type=int, default=768)
    p.add_argument("--block", type=int, default=16)
    p.add_argument("--therm-frac", type=float, default=0.25)
    p.add_argument("--start", choices=["hot", "cold"], default="hot",
                   help="cold = z0 = f^{-1}(0); use at beta >= ~5")
    p.add_argument("--n-layers", type=int, default=24)
    p.add_argument("--n-mixture", type=int, default=8)
    p.add_argument("--hidden", type=int, nargs="+", default=[32, 32])
    p.add_argument("--s-clip", type=float, default=3.0)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # self-describing checkpoints restore their own spec; legacy ones fall
    # back to the architecture flags
    from fthmc_tpu.checkpoint import load_checkpoint_auto
    found = load_checkpoint_auto(args.ckpt)
    if found is not None:
        state, meta, spec, _ = found
    else:
        spec = FlowSpec(n_layers=args.n_layers, coupling="rncp",
                        n_mixture=args.n_mixture,
                        hidden_sizes=tuple(args.hidden), s_clip=args.s_clip)
        cfg = TrainConfig(L=8, beta=args.beta, flow=spec, grad_clip=1.0)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        found = find_and_load_checkpoint(args.ckpt, state)
        if found is None:
            raise SystemExit(f"no checkpoint found at {args.ckpt}")
        state, meta = found
    print("flow restored:", meta, flush=True)
    params = state.params

    lf = LeapfrogConfig(tau=args.tau, nstep=args.nstep)
    key = jax.random.PRNGKey(4242)
    state_path = os.path.join(args.out, "run_state.npz")
    if os.path.exists(state_path):
        # placeholder z0; run_resilient resumes (z, key, done) from the file
        print(f"resuming at traj {int(np.load(state_path)['done'])}",
              flush=True)
        z = jax.numpy.zeros((args.chains, 2, args.L, args.L))
    elif args.start == "cold":
        from fthmc_tpu.models.flow import flow_reverse
        z = flow_reverse(params, jax.numpy.zeros(
            (args.chains, 2, args.L, args.L)), spec)[0]
    else:
        z = lattice.hot_start(jax.random.PRNGKey(9), args.chains, args.L)

    t0 = time.time()

    def progress(done, h):
        if done % (4 * args.block) == 0 or done == args.ntraj:
            print(f"  traj {done}/{args.ntraj}: "
                  f"acc={float(np.asarray(h.acc).mean()):.3f}", flush=True)

    z, hist, info = run_resilient(
        lambda krun, z, n: run_fthmc(params, spec, lf, beta=args.beta,
                                     ntraj=n, z0=z, key=krun,
                                     integrator=args.integrator),
        z, key=key, ntraj=args.ntraj, block=args.block,
        state_path=state_path, on_block=progress)

    therm = int(args.ntraj * args.therm_frac)
    q = np.asarray(hist["q"])[therm:]
    res = {
        "config": vars(args),
        "acc": float(np.asarray(hist["acc"])[therm:].mean()),
        "exp_mdh": float(np.asarray(hist["exp_mdh"])[therm:].mean()),
        "plaq": float(np.asarray(hist["plaq"])[therm:].mean()),
        "wall_s": time.time() - t0,
        "s_per_traj": info["s_per_traj"],
        **chain_stats(q),
    }
    print("FT-HMC:", json.dumps(res, indent=1, default=str), flush=True)
    with open(os.path.join(args.out, "fthmc_results.json"), "w") as f:
        json.dump(res, f, indent=2, default=str)


if __name__ == "__main__":
    main()
