#!/usr/bin/env python
"""Low-lr force-matching fine-tune of a good flow (round 3, VERDICT #1c).

Round-2 finding: KL-training TOWARD the target beta makes flows
leapfrog-rugged, so production uses the smooth beta=3 flow at beta>=4
unchanged - at acc 0.95+ with nstep=128, which over-provisions nstep by
>=2x. This script attacks nstep from the other side: keep the flow's
transport (KL) fixed and minimize the EFFECTIVE-FORCE roughness
E||dS_eff/dz||^2 at the target beta, evaluated where it matters - on
latents harvested from the production FT-HMC chain itself (plus jitter) -
with a very low LR so the transport barely moves.

Protocol:
  1. restore flow (self-describing ckpt), eval acc at --eval-nsteps (A)
  2. harvest an equilibrium latent buffer: FT-HMC at (L, beta), cold start
  3. K steps of Adam(lr) on loss = mean_z ||F_eff(z + eps)||^2 / V
  4. re-eval acc at the same nsteps (B); report A vs B + save the flow

Usage:
  python experiments/finetune_force.py --L 16 --beta 6 \
      --out runs/ft_finetune_b6
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

from fthmc_tpu import lattice
from fthmc_tpu.checkpoint import load_checkpoint_auto, save_checkpoint
from fthmc_tpu.config import LeapfrogConfig, TrainConfig
from fthmc_tpu.hmc import ft_force, run_fthmc_chunked
from fthmc_tpu.models.flow import flow_reverse


def eval_acc(params, spec, L, beta, nsteps, chains, ntraj, z0, key,
             integrator="omelyan", block=32):
    out = {}
    for nstep in nsteps:
        lf = LeapfrogConfig(tau=1.0, nstep=nstep)
        key, k = jax.random.split(key)
        z, h = run_fthmc_chunked(params, spec, lf, beta=beta, ntraj=ntraj,
                                 z0=z0, key=k, block=block,
                                 integrator=integrator)
        jax.block_until_ready(z)
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
    p.add_argument("--ckpt", default="artifacts/flow8x8_b3_rncp24")
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, default=6.0)
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--jitter", type=float, default=0.05)
    p.add_argument("--harvest-ntraj", type=int, default=96)
    p.add_argument("--harvest-nstep", type=int, default=128)
    p.add_argument("--eval-nsteps", type=int, nargs="+",
                   default=[24, 32, 48, 64])
    p.add_argument("--eval-ntraj", type=int, default=192)
    # Mobility-first selection (round-5, VERDICT item 2): the round-4
    # fermaware A/B proved acceptance is the WRONG selection metric
    # (smoother flow, x1.5 LESS topological mobility at equal cost).
    # With --probe-mass > 0 the harness probes wall-clock mobility
    # (B*mob/s, fthmc_tpu.mobility) of the parent, of intermediate
    # checkpoints every --probe-every steps, and of the final flow, and
    # saves the best-by-mobility params to <out>/checkpoints_bestmob.
    p.add_argument("--probe-mass", type=float, default=0.0,
                   help="enable dynamical mobility probes at this fermion "
                        "mass (production selection regime: 0.1)")
    p.add_argument("--probe-every", type=int, default=0,
                   help="probe intermediate params every K fine-tune "
                        "steps (0: only parent + final)")
    p.add_argument("--probe-chains", type=int, default=128)
    p.add_argument("--probe-ntraj", type=int, default=768)
    p.add_argument("--probe-therm", type=int, default=256)
    p.add_argument("--probe-nstep", type=int, default=4)
    p.add_argument("--probe-tau", type=float, default=0.5)
    p.add_argument("--probe-min-events", type=float, default=30,
                   help="statistics floor (auto-extends); below-floor "
                        "probes never select the best checkpoint")
    p.add_argument("--probe-max-extra", type=int, default=8)
    p.add_argument("--platform", default=None, choices=["cpu"],
                   help="force the JAX platform (config-level override; "
                        "JAX_PLATFORMS env is ignored on axon VMs)")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.out, exist_ok=True)

    state, meta, spec, tcfg = load_checkpoint_auto(args.ckpt)
    params0 = state.params
    print(f"flow: {spec.coupling} x{spec.n_layers}", flush=True)
    results = {"args": vars(args)}

    def probe(params, tag, step):
        from fthmc_tpu.mobility import mobility_probe
        st = mobility_probe(params, spec, L=args.L, beta=args.beta,
                            mass=args.probe_mass,
                            n_chains=args.probe_chains,
                            ntraj=args.probe_ntraj,
                            therm=args.probe_therm, tau=args.probe_tau,
                            nstep=args.probe_nstep,
                            min_events=args.probe_min_events,
                            max_extra_blocks=args.probe_max_extra,
                            key=jax.random.PRNGKey(97))
        st["tag"], st["step"] = tag, step
        print(f"  mobility[{tag} step {step}]: B*mob/s = "
              f"{st['B_mob_per_s']:.3g} +- {st['B_mob_per_s_err']:.2g} "
              f"(acc {st['acc']:.3f}, {st['n_events']:.0f} events"
              f"{'' if st['valid'] else ', BELOW FLOOR'})",
              flush=True)
        return st

    # cold start for the harvest + evals
    z_cold = flow_reverse(
        params0, jnp.zeros((args.chains, 2, args.L, args.L)), spec)[0]
    jax.block_until_ready(z_cold)

    # 1. baseline acceptance
    key = jax.random.PRNGKey(55)
    print("baseline acc:", flush=True)
    results["acc_before"] = eval_acc(
        params0, spec, args.L, args.beta, args.eval_nsteps, args.chains,
        args.eval_ntraj, z_cold, jax.random.PRNGKey(1))

    # 2. harvest equilibrium latents from the production chain
    lf = LeapfrogConfig(tau=1.0, nstep=args.harvest_nstep)
    snaps = []

    z = z_cold
    for rep in range(3):
        key, k = jax.random.split(key)
        z, _ = run_fthmc_chunked(params0, spec, lf, beta=args.beta,
                                 ntraj=args.harvest_ntraj // 3, z0=z, key=k,
                                 block=32, integrator="omelyan")
        jax.block_until_ready(z)
        snaps.append(np.asarray(z))
    buf = jnp.asarray(np.concatenate(snaps))   # (3*chains, 2, L, L)
    print("latent buffer:", buf.shape, flush=True)

    # 3. force-matching fine-tune at the TARGET beta on buffered latents
    opt = optax.adam(args.lr)
    opt_state = opt.init(params0)
    V = 2 * args.L * args.L

    @jax.jit
    def step(params, opt_state, key):
        ki, kj = jax.random.split(key)
        idx = jax.random.randint(ki, (args.batch,), 0, buf.shape[0])
        z = buf[idx] + args.jitter * jax.random.normal(
            kj, (args.batch, 2, args.L, args.L))

        def loss_fn(p):
            f = ft_force(p, spec, z, args.beta)
            return jnp.mean(jnp.sum(f * f, axis=(1, 2, 3))) / V

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    probes = []
    if args.probe_mass > 0:
        probes.append(probe(params0, "parent", 0))

    params = params0
    best = {"params": params0, "step": 0,
            "B_mob_per_s": (probes[0]["B_mob_per_s"]
                            if probes and probes[0]["valid"] else 0.0)}
    t0 = time.time()
    losses = []
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
        if i % 100 == 0:
            print(f"step {i}: F^2/V = {losses[-1]:.4f}", flush=True)
        if (args.probe_mass > 0 and args.probe_every > 0
                and (i + 1) % args.probe_every == 0
                and (i + 1) < args.steps):
            st = probe(params, "tuned", i + 1)
            probes.append(st)
            if st["valid"] and st["B_mob_per_s"] > best["B_mob_per_s"]:
                best = {"params": params, "step": i + 1,
                        "B_mob_per_s": st["B_mob_per_s"]}
    print(f"fine-tune wall {time.time()-t0:.0f}s; F^2/V "
          f"{losses[0]:.4f} -> {np.mean(losses[-50:]):.4f}", flush=True)
    results["force_loss_first"] = losses[0]
    results["force_loss_final"] = float(np.mean(losses[-50:]))
    if args.probe_mass > 0:
        st = probe(params, "tuned", args.steps)
        probes.append(st)
        if st["valid"] and st["B_mob_per_s"] > best["B_mob_per_s"]:
            best = {"params": params, "step": args.steps,
                    "B_mob_per_s": st["B_mob_per_s"]}
        results["mobility_probes"] = [
            {k: v for k, v in p.items()} for p in probes]
        results["mobility_best_step"] = best["step"]
        results["mobility_best"] = best["B_mob_per_s"]
        save_checkpoint(os.path.join(args.out, "checkpoints_bestmob"),
                        state._replace(params=best["params"]),
                        era=meta.get("era", 0), epoch=best["step"],
                        train_cfg=tcfg)
        print(f"best-by-mobility: step {best['step']} "
              f"(B*mob/s {best['B_mob_per_s']:.3g}) -> "
              f"{args.out}/checkpoints_bestmob", flush=True)

    # 4. re-eval with the SAME cold start + eval seeds
    print("fine-tuned acc:", flush=True)
    z_cold2 = flow_reverse(
        params, jnp.zeros((args.chains, 2, args.L, args.L)), spec)[0]
    results["acc_after"] = eval_acc(
        params, spec, args.L, args.beta, args.eval_nsteps, args.chains,
        args.eval_ntraj, z_cold2, jax.random.PRNGKey(1))

    save_checkpoint(os.path.join(args.out, "checkpoints"),
                    state._replace(params=params), era=meta.get("era", 0),
                    epoch=0, train_cfg=tcfg)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("done ->", args.out, flush=True)


if __name__ == "__main__":
    main()
