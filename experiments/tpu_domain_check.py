#!/usr/bin/env python
"""Real-TPU compile + execution check for the domain-decomposed drivers.

The round-2 lesson (ROADMAP: Mosaic/interpret) applies to shard_map
programs too: the 8-virtual-CPU-device mesh validates the collective
math but NOT TPU lowering. This script builds a rows-mesh over the real
TPU devices available (a 1-device mesh on this infra) and executes the
whole-run domain-decomposed drivers — plain HMC (`run_domain_hmc`) and
flowed HMC with the production beta=3 flow (`run_domain_fthmc`) — a few
trajectories each, checking plaquette/acceptance sanity. Passing means
the shard_map + ppermute-halo programs compile and run on TPU hardware,
not just under the host-platform emulation used by tests/.

Usage:
  python experiments/tpu_domain_check.py --out runs/tpu_domain_check
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
from fthmc_tpu.config import HMCConfig, LeapfrogConfig
from fthmc_tpu.parallel.domain import make_rows_mesh, run_domain_hmc
from fthmc_tpu.parallel.domain_flow import run_domain_fthmc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/flow8x8_b3_rncp24")
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, default=3.0)
    p.add_argument("--chains", type=int, default=16)
    p.add_argument("--ntraj", type=int, default=8)
    p.add_argument("--out", default="runs/tpu_domain_check")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    devs = jax.devices()
    report = {"platform": devs[0].platform, "n_devices": len(devs)}
    print(f"devices: {len(devs)} x {devs[0].platform}", flush=True)
    mesh = make_rows_mesh(len(devs))

    # --- plain domain HMC ---
    cfg = HMCConfig(L=args.L, beta=args.beta, n_chains=args.chains,
                    ntraj=args.ntraj, tau=1.0, nstep=16, seed=11,
                    randinit=True)
    t0 = time.perf_counter()
    x, hist = run_domain_hmc(mesh, cfg)
    plaq = float(np.asarray(hist["plaq"])[-1].mean())
    acc = float(np.asarray(hist["acc"]).mean())
    wall = time.perf_counter() - t0
    exact = lattice.PLAQ_EXACT.get(args.beta, float("nan"))
    report["hmc"] = {"acc": acc, "plaq_last": plaq, "exact_plaq": exact,
                     "wall_s": wall}
    print(f"domain HMC: acc={acc:.3f} plaq={plaq:.5f} "
          f"(exact {exact:.5f}) wall={wall:.1f}s", flush=True)
    assert acc > 0.5, acc

    # --- domain FT-HMC with the production flow ---
    found = load_checkpoint_auto(args.ckpt)
    if found is None:
        raise SystemExit(f"no checkpoint at {args.ckpt}")
    state, meta, spec, _ = found
    print("flow restored:", meta, flush=True)
    lf = LeapfrogConfig(tau=1.0, nstep=256)
    key = jax.random.PRNGKey(7)
    z0 = lattice.hot_start(key, args.chains, args.L)
    t0 = time.perf_counter()
    z, hist = run_domain_fthmc(mesh, state.params, spec, lf,
                               beta=args.beta, ntraj=args.ntraj,
                               z0=z0, key=key)
    acc_ft = float(np.asarray(hist["acc"]).mean())
    plaq_ft = float(np.asarray(hist["plaq"])[-1].mean())
    emdh = float(np.asarray(hist["exp_mdh"]).mean())
    wall = time.perf_counter() - t0
    report["fthmc"] = {"acc": acc_ft, "plaq_last": plaq_ft,
                       "exp_mdh": emdh, "wall_s": wall}
    print(f"domain FT-HMC: acc={acc_ft:.3f} plaq={plaq_ft:.5f} "
          f"exp(-dH)={emdh:.3f} wall={wall:.1f}s", flush=True)
    assert acc_ft > 0.2, acc_ft

    report["ok"] = True
    json.dump(report, open(os.path.join(args.out, "report.json"), "w"),
              indent=1)
    print("TPU_DOMAIN_CHECK_OK", flush=True)


if __name__ == "__main__":
    main()
