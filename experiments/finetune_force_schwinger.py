#!/usr/bin/env python
"""Force-matching fine-tune of a flow at a SCHWINGER-model target
(gauge + pseudofermion force through the flow), extending
experiments/finetune_force.py (pure-gauge) to dynamical fermions.

Round-3 measurement: the latent-space ruggedness that sets the FT-HMC
step size has two parts — the gauge S_eff (fixed by the pure-gauge
fine-tune) and the flow-Jacobian-amplified fermion force (binds at
dt <= ~1/24 for the parent flow at 16^2 beta=5 m=0.1,
artifacts/round3/schw_mts_scan_b5_*.json). This script minimizes
E||dS_eff_total/dz||^2 on equilibrium latents with pseudofermions
refreshed per batch (phi ~ heatbath at T(z), the same distribution the
sampler sees). The CG solution inside the force is stop-gradient
(variational form), so the params-gradient needs no solver
differentiation.

  python experiments/finetune_force_schwinger.py --out runs/ftschw_b6 \
      --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --beta 6 --mass 0.1
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
import optax

from fthmc_tpu import fermion
from fthmc_tpu.checkpoint import load_checkpoint_auto, save_checkpoint
from fthmc_tpu.models.flow import flow_reverse
from fthmc_tpu.schwinger import (SchwingerConfig, _run_fthmc_dyn_scan,
                                 ft_dyn_force)


def eval_acc(params, spec, cfg, nsteps, ntraj, z0, key):
    import dataclasses
    out = {}
    for nstep in nsteps:
        c = dataclasses.replace(cfg, nstep=nstep)
        key, k = jax.random.split(key)
        z, h = _run_fthmc_dyn_scan(params, spec, k, z0, c, ntraj)
        float(jnp.sum(z))
        t = ntraj // 4
        out[str(nstep)] = {
            "acc": float(np.asarray(h.acc)[t:].mean()),
            "plaq": float(np.asarray(h.plaq)[t:].mean()),
            "abs_dh": float(np.abs(np.asarray(h.dh)[t:]).mean()),
            "exp_mdh": float(np.asarray(h.exp_mdh)[t:].mean()),
        }
        print("  nstep", nstep, out[str(nstep)], flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/flow8x8_b3_rncp24_ftb6")
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, default=6.0)
    p.add_argument("--mass", type=float, default=0.1)
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--jitter", type=float, default=0.05)
    p.add_argument("--harvest-ntraj", type=int, default=192)
    p.add_argument("--harvest-nstep", type=int, default=16)
    p.add_argument("--harvest-tau", type=float, default=0.5)
    p.add_argument("--eval-nsteps", type=int, nargs="+",
                   default=[4, 6, 8, 12])
    p.add_argument("--eval-ntraj", type=int, default=128)
    p.add_argument("--cg-tol", type=float, default=1e-9)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    state, meta, spec, tcfg = load_checkpoint_auto(args.ckpt)
    params0 = state.params
    print(f"flow: {spec.coupling} x{spec.n_layers}", flush=True)
    results = {"args": vars(args)}
    cfg = SchwingerConfig(L=args.L, beta=args.beta, mass=args.mass,
                          tau=args.harvest_tau, nstep=args.harvest_nstep,
                          n_chains=args.chains)

    z_cold, _ = flow_reverse(
        params0, jnp.zeros((args.chains, 2, args.L, args.L)), spec)
    float(jnp.sum(z_cold))

    key = jax.random.PRNGKey(77)
    # 1. harvest equilibrium latents with the production sampler
    snaps, z = [], z_cold
    for rep in range(3):
        key, k = jax.random.split(key)
        z, _ = _run_fthmc_dyn_scan(params0, spec, k, z, cfg,
                                   args.harvest_ntraj // 3)
        float(jnp.sum(z))
        snaps.append(np.asarray(z))
    buf = jnp.asarray(np.concatenate(snaps))
    print("latent buffer:", buf.shape, flush=True)

    # 2. baseline acceptance ladder (tau=harvest_tau)
    print("baseline acc:", flush=True)
    results["acc_before"] = eval_acc(params0, spec, cfg, args.eval_nsteps,
                                     args.eval_ntraj, z,
                                     jax.random.PRNGKey(1))

    # 3. fine-tune on the TOTAL (gauge + fermion) latent force
    opt = optax.adam(args.lr)
    opt_state = opt.init(params0)
    V = 2 * args.L * args.L

    @jax.jit
    def step(params, opt_state, key):
        ki, kj, kp = jax.random.split(key, 3)
        idx = jax.random.randint(ki, (args.batch,), 0, buf.shape[0])
        zb = buf[idx] + args.jitter * jax.random.normal(
            kj, (args.batch, 2, args.L, args.L))

        def loss_fn(p):
            from fthmc_tpu.models.flow import flow_forward
            x, _ = flow_forward(p, zb, spec)
            phi, _ = fermion.pf_refresh(kp, jax.lax.stop_gradient(x),
                                        cfg.mass, eo=cfg.eo_precond)
            f, _ = ft_dyn_force(p, spec, zb, cfg, phi,
                                jnp.zeros_like(phi), False)
            return jnp.mean(jnp.sum(f * f, axis=(1, 2, 3))) / V

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, losses, t0 = params0, [], time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
        if i % 100 == 0:
            print(f"step {i}: F^2/V = {losses[-1]:.4f}", flush=True)
    print(f"fine-tune wall {time.time() - t0:.0f}s; F^2/V "
          f"{losses[0]:.4f} -> {np.mean(losses[-50:]):.4f}", flush=True)
    results["force_loss_first"] = losses[0]
    results["force_loss_final"] = float(np.mean(losses[-50:]))

    # 4. re-eval
    print("fine-tuned acc:", flush=True)
    results["acc_after"] = eval_acc(params, spec, cfg, args.eval_nsteps,
                                    args.eval_ntraj, z,
                                    jax.random.PRNGKey(1))

    save_checkpoint(os.path.join(args.out, "checkpoints"),
                    state._replace(params=params), era=meta.get("era", 0),
                    epoch=0, train_cfg=tcfg)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("done ->", args.out, flush=True)


if __name__ == "__main__":
    main()
