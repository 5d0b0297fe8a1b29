#!/usr/bin/env python
"""Pion-correlator cross-sampler validation on saved production states.

Physics check one level deeper than plaq/chi_Q: compute the zero-momentum
pion correlator C(t) (and the effective mass from its cosh fit) on the
final thermalized configurations of a PLAIN production chain and an
FT-HMC production chain at the same (L, beta, mass). With no analytic
value available for the interacting theory, cross-sampler agreement of a
fermionic observable IS the validation (same convention as plaq/chi_Q,
BENCH.md round-3 Schwinger section). FT states are stored as latents; they
are pushed through the flow to gauge fields first.

    python experiments/pion_xcheck.py --beta 6 \
        --plain-state runs/schw_b6_plain_t2n8/run_state.npz \
        --ft-state runs/schw_b6_ft12l_t05n4/run_state.npz \
        --ckpt artifacts/flow8x8_b3_rncp12_fw10 --out runs/pion_b6
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import fermion
from fthmc_tpu.checkpoint import load_checkpoint_auto


def corr_stats(theta, mass, batch=32):
    """C(t) mean + bootstrap err over configs; effective mass at each t."""
    outs = []
    n = theta.shape[0]
    for i in range(0, n, batch):
        c = fermion.pion_correlator(jnp.asarray(theta[i:i + batch]), mass)
        outs.append(np.asarray(c))
    c = np.concatenate(outs)                       # (B, L0)
    mean = c.mean(axis=0)
    rng = np.random.default_rng(0)
    boots = np.stack([c[rng.integers(0, n, n)].mean(axis=0)
                      for _ in range(200)])
    err = boots.std(axis=0)
    # effective mass from the symmetric cosh ratio C(t-1)+C(t+1) / 2C(t)
    L0 = mean.shape[0]
    meff = np.arccosh(np.clip(
        (np.roll(mean, 1) + np.roll(mean, -1)) / (2 * mean), 1.0, None))
    return mean, err, meff, c


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--plain-state", required=True)
    p.add_argument("--ft-state", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--mass", type=float, default=0.1)
    p.add_argument("--beta", type=float, default=6.0)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    theta_plain = np.load(args.plain_state)["z"]

    state, meta, spec, _ = load_checkpoint_auto(args.ckpt)
    from fthmc_tpu.models.flow import flow_forward
    z_ft = jnp.asarray(np.load(args.ft_state)["z"])
    theta_ft = np.asarray(flow_forward(state.params, z_ft, spec)[0])

    res = {"args": vars(args)}
    for tag, th in (("plain", theta_plain), ("ft", theta_ft)):
        mean, err, meff, c = corr_stats(th, args.mass, args.batch)
        res[tag] = {"n_cfg": int(th.shape[0]),
                    "corr": mean.tolist(), "corr_err": err.tolist(),
                    "meff": meff.tolist()}
        mid = mean.shape[0] // 4
        print(f"{tag}: n={th.shape[0]}  C(1)={mean[1]:.5g}({err[1]:.2g})  "
              f"C({mid})={mean[mid]:.5g}({err[mid]:.2g})  "
              f"meff({mid})={meff[mid]:.4f}", flush=True)

    # cross-sampler pull per timeslice
    cp, cf = np.array(res["plain"]["corr"]), np.array(res["ft"]["corr"])
    ep, ef = (np.array(res["plain"]["corr_err"]),
              np.array(res["ft"]["corr_err"]))
    pulls = (cp - cf) / np.sqrt(ep ** 2 + ef ** 2 + 1e-300)
    res["max_abs_pull"] = float(np.abs(pulls).max())
    res["mean_abs_pull"] = float(np.abs(pulls).mean())
    print(f"cross-sampler pulls: max |pull| = {res['max_abs_pull']:.2f}, "
          f"mean = {res['mean_abs_pull']:.2f}", flush=True)

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(res, f, indent=1)
    print("done ->", args.out, flush=True)


if __name__ == "__main__":
    main()
