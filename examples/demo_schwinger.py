#!/usr/bin/env python
"""Dynamical fermions end-to-end: the two-flavor Schwinger model.

Walkthrough (one TPU chip, ~3 min):
  1. plain pseudofermion HMC at 8^2, beta=2, m0=0.3 — exactness checks
     (<exp(-dH)> ~ 1) and the fermion determinant's plaquette shift;
  2. heavy-mass limit -> pure-gauge <plaq> (the analytic cross-check);
  3. fermionic observables: stochastic <psibar psi> and the point-source
     pion correlator C(t) with its cosh effective mass;
  4. FT-HMC with a pure-gauge-trained flow on the DYNAMICAL theory
     (partial trivialization: the flow flattens the gauge measure; the
     Metropolis step corrects both the flow mismatch and the determinant).

This regime is the framework's wall-clock headline: with a CG solve in
every force evaluation, FT-HMC's tau_int(Q) advantage converts to real
eff-samples/s (BENCH.md round-3 Schwinger section; cf. the pure-gauge
ladder where the stencil force is too cheap for ANY flow to amortize).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.fermion import chiral_condensate, pion_correlator
from fthmc_tpu.schwinger import (SchwingerConfig, run_fthmc_dyn_chunked,
                                 run_hmc_dyn_chunked)

L, BETA, MASS = 8, 2.0, 0.3


def main():
    print("== 1. plain dynamical HMC ==", flush=True)
    cfg = SchwingerConfig(L=L, beta=BETA, mass=MASS, tau=1.0, nstep=10,
                          n_chains=32, ntraj=512)
    x, h = run_hmc_dyn_chunked(cfg, block=128, key=jax.random.PRNGKey(0))
    therm = 128
    plaq = float(np.asarray(h.plaq)[therm:].mean())
    emdh = float(np.asarray(h.exp_mdh)[therm:].mean())
    print(f"  acc={np.asarray(h.acc)[therm:].mean():.3f}  "
          f"<exp(-dH)>={emdh:.4f} (want ~1)  <plaq>={plaq:.5f} vs "
          f"pure-gauge {lattice.PLAQ_EXACT[BETA]:.5f} "
          f"(fermions push it UP)", flush=True)

    print("== 2. heavy-mass limit ==", flush=True)
    hcfg = SchwingerConfig(L=L, beta=BETA, mass=25.0, tau=1.0, nstep=10,
                           n_chains=32, ntraj=384, cg_maxiter=100)
    _, hh = run_hmc_dyn_chunked(hcfg, block=128, key=jax.random.PRNGKey(1))
    hplaq = float(np.asarray(hh.plaq)[128:].mean())
    print(f"  m0=25: <plaq>={hplaq:.5f} -> pure gauge "
          f"{lattice.PLAQ_EXACT[BETA]:.5f} (det ~ const)", flush=True)

    print("== 3. fermionic observables ==", flush=True)
    cc = np.asarray(chiral_condensate(jax.random.PRNGKey(2), x, MASS,
                                      n_noise=16))
    print(f"  <psibar psi> = {cc.mean():.4f} +- "
          f"{cc.std(ddof=1) / len(cc) ** 0.5:.4f}", flush=True)
    c = np.asarray(pion_correlator(x, MASS)).mean(axis=0)
    meff = np.log(c[1:L // 2] / c[2:L // 2 + 1])
    print(f"  pion C(t): {np.array2string(c, precision=4)}", flush=True)
    print(f"  effective mass m_eff(t): "
          f"{np.array2string(meff, precision=3)}", flush=True)

    print("== 4. FT-HMC on the dynamical theory ==", flush=True)
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "flow8x8_b3_rncp24")
    if not os.path.isdir(ckpt):
        print("  (no flow checkpoint found; skipping)", flush=True)
        return
    from fthmc_tpu.checkpoint import load_checkpoint_auto
    state, meta, spec, _ = load_checkpoint_auto(ckpt)
    fcfg = SchwingerConfig(L=L, beta=3.0, mass=MASS, tau=0.5, nstep=48,
                           n_chains=32, ntraj=256)
    from fthmc_tpu.models.flow import flow_reverse
    z0, _ = flow_reverse(state.params,
                         jnp.zeros((32, 2, L, L), jnp.float32), spec)
    z, hf = run_fthmc_dyn_chunked(state.params, spec, fcfg, block=64,
                                  z0=z0, key=jax.random.PRNGKey(3))
    therm = 64
    print(f"  beta=3 m0={MASS}: acc={np.asarray(hf.acc)[therm:].mean():.3f}"
          f"  <plaq>={np.asarray(hf.plaq)[therm:].mean():.5f}"
          f"  <exp(-dH)>={np.asarray(hf.exp_mdh)[therm:].mean():.3f}"
          f"  Q-mobility/traj={np.asarray(hf.dq)[therm:].mean():.3f}",
          flush=True)


if __name__ == "__main__":
    main()
