#!/usr/bin/env python
"""Convert a thermalized PLAIN dynamical run_state (physical links x) into
an FT-HMC latent seed state: z = flow_reverse(x), written in the
schwinger_tauint.py resume format (so both schwinger_scan --ft-state and a
seeded schwinger_tauint production chain can start from dynamical
equilibrium — at 64^2 a cold FT start cannot thermalize itself at any
usable nstep; measured round-3 session-4).

    python experiments/seed_ft64.py --plain-state runs/x/run_state.npz \
        --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --out runs/schw_L64_ft_seed
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu.checkpoint import load_checkpoint_auto
from fthmc_tpu.models.flow import flow_forward, flow_reverse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--plain-state", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--chains", type=int, default=None,
                   help="subset/tile to this many chains (default: keep)")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    x = np.load(args.plain_state)["z"]  # plain runs store physical x as 'z'
    if args.chains:
        if x.shape[0] < args.chains:
            x = np.tile(x, (-(-args.chains // x.shape[0]), 1, 1, 1))
        x = x[:args.chains]
    state, meta, spec, _ = load_checkpoint_auto(args.ckpt)
    print(f"inverting flow on {x.shape} ...", flush=True)
    z, _ = flow_reverse(state.params, jnp.asarray(x), spec)
    # round-trip check: forward(z) must reproduce x (mod 2pi)
    xr, _ = flow_forward(state.params, z, spec)
    # real-arithmetic angle wrap: complex exp/angle are UNIMPLEMENTED on the
    # axon TPU backend (observed round-3 session-5)
    d = (xr - jnp.asarray(x) + jnp.pi) % (2 * jnp.pi) - jnp.pi
    err = float(jnp.max(jnp.abs(d)))
    print(f"roundtrip max |x - f(f^-1(x))| = {err:.2e}", flush=True)
    # Guard against a WRONG FlowSpec (that gives O(1) errors), not against
    # fp32 + per-layer bisection (tol 1e-6 on the VALUE) accumulation over
    # 24 layers x ~0.5M links, which measures ~3.5e-3 max at 64^2 and is a
    # negligible perturbation of an equilibrated seed (the chain re-therms
    # it in a few trajectories either way).
    assert err < 5e-2, err

    np.savez(os.path.join(args.out, "run_state.npz"),
             z=np.asarray(z), done=0,
             key=np.asarray(jax.random.PRNGKey(1234)),
             acc=np.zeros(0, np.float32), plaq=np.zeros(0, np.float32),
             exp_mdh=np.zeros(0, np.float32),
             q=np.zeros((0, x.shape[0]), np.float32))
    print(f"seed written -> {args.out}/run_state.npz", flush=True)


if __name__ == "__main__":
    main()
