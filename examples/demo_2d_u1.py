#!/usr/bin/env python
"""Single-file walkthrough: HMC -> flow training -> flow sampling -> FT-HMC.

The analogue of the reference's standalone demo (hmc_2dU1.py, 745 LoC): one
script, small lattice, every capability end to end, printing the physics
checks as it goes. Runs in a few minutes on one TPU chip (scale the knobs
down further for CPU).

    python examples/demo_2d_u1.py [--quick]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fthmc_tpu import api
from fthmc_tpu.config import HMCConfig, LeapfrogConfig, TrainConfig
from fthmc_tpu.observables import tau_int


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny run for smoke-testing")
    ap.add_argument("--beta", type=float, default=2.0)
    ap.add_argument("--L", type=int, default=8)
    args = ap.parse_args()

    q = args.quick
    if q:
        print("[--quick: tiny flow/short runs; physics checks hold but "
              "acceptances/ESS will be low. Run without --quick for the "
              "real numbers.]")
    beta, L = args.beta, args.L
    exact = api.PLAQ_EXACT.get(beta)

    # ---- 1. plain HMC baseline -------------------------------------------
    print(f"== plain HMC {L}x{L} beta={beta} ==")
    cfg = HMCConfig(beta=beta, L=L, tau=2.0, nstep=10,
                    ntraj=256 if q else 2048, n_chains=16 if q else 64,
                    randinit=True)
    t0 = time.time()
    x, hist = api.run_hmc(cfg)
    jax.block_until_ready(x)
    therm = cfg.ntraj // 4
    plaq = np.asarray(hist.plaq)[therm:]
    qch = np.asarray(hist.q)[therm:]
    print(f"  <plaq> = {plaq.mean():.5f}  (exact {exact})")
    print(f"  <exp(-dH)> = {np.asarray(hist.exp_mdh)[therm:].mean():.4f}")
    print(f"  acc = {np.asarray(hist.acc).mean():.3f}   "
          f"chi_Q = {(qch**2).mean():.3f}   "
          f"tau_int(Q) = {np.mean([tau_int(qch[:, c]) for c in range(qch.shape[1])]):.2f}")
    print(f"  wall: {time.time()-t0:.1f}s")

    # ---- 2. train a gauge-equivariant flow -------------------------------
    print("== train flow ==")
    from fthmc_tpu.train import train
    tcfg = TrainConfig(L=L, beta=beta, n_era=2 if q else 10,
                       n_epoch=20 if q else 100,
                       batch_size=64, base_lr=1e-3,
                       flow=api.FlowSpec(n_layers=4 if q else 16))
    t0 = time.time()
    state, history = train(tcfg)
    ess = float(np.mean(history["ess"][-10:]))
    print(f"  final ESS = {ess:.3f}   wall: {time.time()-t0:.1f}s")

    # ---- 3. flow-only sampling (independence Metropolis) -----------------
    print("== flow sampling ==")
    out = api.generate_ensemble(
        state.params, tcfg.flow, beta=beta, L=L,
        ensemble_size=512 if q else 8192, batch_size=64,
        key=jax.random.PRNGKey(7))
    print(f"  accept = {out['accept_rate']:.3f}   "
          f"chi_Q = {out['suscept_mean']:.3f} +/- {out['suscept_err']:.3f}")

    # ---- 4. flowed HMC ----------------------------------------------------
    print("== FT-HMC ==")
    ft = api.FieldTransformation(state.params, tcfg.flow, beta=beta,
                                 lf=LeapfrogConfig(tau=1.0,
                                                   nstep=8 if q else 64))
    z0 = ft.initializer(jax.random.PRNGKey(1), 8 if q else 16, L)
    t0 = time.time()
    z, fhist = ft.run(jax.random.PRNGKey(2), z0,
                      num_trajs=64 if q else 1024)
    jax.block_until_ready(z)
    therm = (64 if q else 1024) // 4
    fq = np.asarray(fhist.q)[therm:]
    print(f"  acc = {np.asarray(fhist.acc).mean():.3f}   "
          f"<exp(-dH)> = {np.asarray(fhist.exp_mdh)[therm:].mean():.4f}")
    print(f"  <plaq> = {np.asarray(fhist.plaq)[therm:].mean():.5f}   "
          f"tau_int(Q) = {np.mean([tau_int(fq[:, c]) for c in range(fq.shape[1])]):.2f}")
    print(f"  wall: {time.time()-t0:.1f}s")

    # ---- 5. volume transfer: same flow params at 2L ----------------------
    print(f"== volume transfer -> {2*L}x{2*L} (no retraining) ==")
    ft2 = api.FieldTransformation(state.params, tcfg.flow, beta=beta,
                                  lf=LeapfrogConfig(tau=1.0,
                                                    nstep=8 if q else 64))
    z0 = ft2.initializer(jax.random.PRNGKey(3), 4 if q else 16, 2 * L)
    z, fhist2 = ft2.run(jax.random.PRNGKey(4), z0,
                        num_trajs=32 if q else 256)
    jax.block_until_ready(z)
    print(f"  acc = {np.asarray(fhist2.acc).mean():.3f}   "
          f"<plaq> = {np.asarray(fhist2.plaq)[-(16 if q else 128):].mean():.5f}")
    print("done.")


if __name__ == "__main__":
    main()
