#!/usr/bin/env python
"""Partial-trivialization demo: run FT-HMC at beta = 4/5/6 on 16^2 with the
8^2-trained beta=3 flow, UNCHANGED (artifacts/flow8x8_b3_rncp24).

The round-2 discovery this demonstrates (BENCH.md): a smooth flow trained
at a LOWER beta integrates beautifully at higher beta - it only needs to
flatten the landscape, the Metropolis step corrects the rest. Measured
headline: 16^2 beta=6 tau_int(Q) 22.0(1.2) vs plain HMC 1073(38) - 48.8x
topological decorrelation at the north-star point.

Usage:  python examples/demo_highbeta.py [--beta 6.0] [--ntraj 128]
(Real TPU recommended; ~1 s/trajectory at the default config.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.checkpoint import load_checkpoint
from fthmc_tpu.config import FlowSpec, LeapfrogConfig, TrainConfig
from fthmc_tpu.hmc import run_fthmc_chunked
from fthmc_tpu.train import init_train_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--beta", type=float, default=6.0)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--ntraj", type=int, default=128)
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--nstep", type=int, default=128)
    p.add_argument("--ckpt", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "flow8x8_b3_rncp24"))
    args = p.parse_args()

    spec = FlowSpec(n_layers=24, coupling="rncp", n_mixture=8,
                    hidden_sizes=(32, 32), s_clip=3.0)
    state = init_train_state(jax.random.PRNGKey(0),
                             TrainConfig(L=8, beta=args.beta, flow=spec,
                                         grad_clip=1.0))
    state, meta = load_checkpoint(args.ckpt, state)
    print(f"beta=3 flow restored ({meta}); running FT-HMC at "
          f"{args.L}^2 beta={args.beta}", flush=True)

    lf = LeapfrogConfig(tau=1.0, nstep=args.nstep)
    z0 = lattice.hot_start(jax.random.PRNGKey(1), args.chains, args.L)
    z, h = run_fthmc_chunked(state.params, spec, lf, beta=args.beta,
                             ntraj=args.ntraj, z0=z0,
                             key=jax.random.PRNGKey(2), block=16,
                             integrator="omelyan")
    t = args.ntraj // 4
    q = np.asarray(h.q)[t:]
    print(f"acc      = {np.asarray(h.acc)[t:].mean():.3f}")
    print(f"<exp-dH> = {np.asarray(h.exp_mdh)[t:].mean():.4f}  (exact: 1)")
    print(f"<plaq>   = {np.asarray(h.plaq)[t:].mean():.5f}  "
          f"(exact: {lattice.PLAQ_EXACT.get(args.beta)})")
    print(f"chi_Q    = {np.mean(q ** 2):.3f}")
    print(f"Q mobility <(dQ)^2> = {np.mean((q[1:] - q[:-1]) ** 2):.3f} "
          "per trajectory (plain HMC at beta=6: ~0.002)")


if __name__ == "__main__":
    main()
