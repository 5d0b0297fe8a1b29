#!/usr/bin/env python
"""Topological-mobility demonstration at production scale (BASELINE
config #5: batched chains at 64^2, beta >= 6).

At beta=6 on 64^2, plain-HMC topological tunneling is so rare that
tau_int(Q) is unmeasurable in any reasonable run - the honest statistic is
the per-trajectory mobility <(Q(t+1)-Q(t))^2>, which needs only O(10^4)
trajectory samples (chains x trajectories). The flow is the 8^2-trained
beta=3 rncp flagship, volume-transferred with zero retraining (partial
trivialization, BENCH.md)."""
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
from fthmc_tpu.hmc import run_fthmc_chunked, run_hmc_chunked
from fthmc_tpu.train import init_train_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/flow8x8_b3_rncp24")
    p.add_argument("--L", type=int, default=64)
    p.add_argument("--beta", type=float, default=6.0)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--nstep", type=int, default=128)
    p.add_argument("--integrator", default="omelyan")
    p.add_argument("--chains", type=int, default=256)
    p.add_argument("--ntraj", type=int, default=64)
    p.add_argument("--block", type=int, default=8)
    p.add_argument("--hmc-ntraj", type=int, default=2048)
    p.add_argument("--hmc-nstep", type=int, default=32)
    p.add_argument("--therm-frac", type=float, default=0.25)
    p.add_argument("--cold", action="store_true",
                   help="ordered (cold) start - the right initialization "
                        "deep in the beta >= 6 phase where hot starts need "
                        "O(100) trajectories to thermalize. The FT chain "
                        "starts at z0 = f^-1(0) via the bisection inverse.")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    spec = FlowSpec(n_layers=24, coupling="rncp", n_mixture=8,
                    hidden_sizes=(32, 32), s_clip=3.0)
    state = init_train_state(jax.random.PRNGKey(0),
                             TrainConfig(L=8, beta=args.beta, flow=spec,
                                         grad_clip=1.0))
    state, meta = load_checkpoint(args.ckpt, state)
    print("flow restored:", meta, flush=True)

    key = jax.random.PRNGKey(11)
    if args.cold:
        import jax.numpy as jnp
        from fthmc_tpu.models.flow import flow_reverse
        y_cold = jnp.zeros((args.chains, 2, args.L, args.L), jnp.float32)
        z0, _ = flow_reverse(state.params, y_cold, spec)
        jax.block_until_ready(z0)
        print("cold start: z0 = f^-1(0) via bisection", flush=True)
    else:
        z0 = lattice.hot_start(key, args.chains, args.L)
    lf = LeapfrogConfig(tau=args.tau, nstep=args.nstep)
    t0 = time.time()
    key, kft, kh = jax.random.split(key, 3)
    z, h = run_fthmc_chunked(state.params, spec, lf, beta=args.beta,
                             ntraj=args.ntraj, z0=z0, key=kft,
                             block=args.block, integrator=args.integrator)
    wall_ft = time.time() - t0
    therm = int(args.ntraj * args.therm_frac)
    q = np.asarray(h.q)
    dq2_ft = float(np.mean((q[therm + 1:] - q[therm:-1]) ** 2))

    hcfg = HMCConfig(beta=args.beta, L=args.L, tau=args.tau,
                     nstep=args.hmc_nstep, ntraj=args.hmc_ntraj,
                     n_chains=args.chains, randinit=not args.cold)
    x, hh = run_hmc_chunked(hcfg, block=1024, key=kh)
    th = int(args.hmc_ntraj * args.therm_frac)
    qh = np.asarray(hh.q)
    dq2_h = float(np.mean((qh[th + 1:] - qh[th:-1]) ** 2))

    res = {
        "config": vars(args),
        "fthmc": {
            "acc": float(np.asarray(h.acc)[therm:].mean()),
            "exp_mdh": float(np.asarray(h.exp_mdh)[therm:].mean()),
            "plaq": float(np.asarray(h.plaq)[therm:].mean()),
            "q_mobility_dt1": dq2_ft,
            "chi_q": float(np.mean(q[therm:] ** 2)),
            "s_per_traj": wall_ft / args.ntraj,
            "samples": int((args.ntraj - therm) * args.chains),
        },
        "plain_hmc": {
            "acc": float(np.asarray(hh.acc)[th:].mean()),
            "plaq": float(np.asarray(hh.plaq)[th:].mean()),
            "q_mobility_dt1": dq2_h,
            "chi_q": float(np.mean(qh[th:] ** 2)),
            "samples": int((args.hmc_ntraj - th) * args.chains),
        },
        "exact_plaq": lattice.PLAQ_EXACT.get(args.beta),
        "mobility_ratio": dq2_ft / max(dq2_h, 1e-12),
    }
    print(json.dumps(res, indent=1, default=str), flush=True)
    with open(os.path.join(args.out, "mobility.json"), "w") as f:
        json.dump(res, f, indent=2, default=str)


if __name__ == "__main__":
    main()
