#!/usr/bin/env python
"""Train a flow at beta >= 3 (spline or NCP coupling, beta-annealed) and
evaluate it for FT-HMC: acceptance vs nstep, then tau_int(Q) head-to-head
against plain HMC if acceptance clears 0.5.

The round-1 finding this attacks: NCP flows are un-integrable for FT-HMC at
16^2 beta >= 3 (BENCH.md). The spline coupling family + annealing is the
round-2 fix (VERDICT.md next-round item 1).

Usage:
  python experiments/train_highbeta.py --L 16 --beta 3 --outdir runs/b3
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
from fthmc_tpu.checkpoint import save_checkpoint
from fthmc_tpu.config import FlowSpec, HMCConfig, LeapfrogConfig, TrainConfig
from fthmc_tpu.hmc import run_fthmc, run_fthmc_chunked, run_hmc
from fthmc_tpu.models.flow import count_parameters
from fthmc_tpu.observables import tau_int
from fthmc_tpu.train import init_train_state, train


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--train-L", type=int, default=None,
                   help="train at this (smaller) lattice and volume-transfer "
                        "to --L for the FT-HMC eval (flow params are "
                        "L-independent). Round-2 finding: natively-trained "
                        "16^2 flows are rugged (leapfrog-unstable S_eff); "
                        "8^2-trained flows transfer smooth.")
    p.add_argument("--beta", type=float, default=3.0)
    p.add_argument("--beta-init", type=float, default=2.0)
    p.add_argument("--anneal-frac", type=float, default=0.6)
    p.add_argument("--coupling", default="rncp")  # the family every round-2 headline used; spline is sampling-only
    p.add_argument("--n-knots", type=int, default=8)
    p.add_argument("--n-mixture", type=int, default=8)
    p.add_argument("--n-layers", type=int, default=24)
    p.add_argument("--hidden", type=int, nargs="+", default=[32, 32])
    p.add_argument("--activation", default="silu")
    p.add_argument("--s-clip", type=float, default=3.0)
    p.add_argument("--with-force", action="store_true")
    p.add_argument("--force-weight", type=float, default=0.0,
                   help="joint smoothness regularizer: loss = D_KL + "
                        "w * mean(F_eff^2) (round-3: targets the "
                        "seed-sensitive ruggedness of pure-KL optima)")
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--ferm-mass", type=float, default=0.0,
                   help="fermion-aware smoothness: put the exact-log-det "
                        "dynamical force (this Wilson mass) in the "
                        "force-weight regularizer (train.ft_force_dyn)")
    p.add_argument("--sched", action="store_true",
                   help="reduce-on-plateau LR schedule")
    p.add_argument("--integrator", default="leapfrog",
                   choices=["leapfrog", "omelyan"])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n-era", type=int, default=20)
    p.add_argument("--n-epoch", type=int, default=500)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--outdir", required=True)
    p.add_argument("--eval-chains", type=int, default=64)
    p.add_argument("--eval-ntraj", type=int, default=256)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--nsteps", type=int, nargs="+", default=[32, 64, 128])
    # Per-era mobility probe (round-5, VERDICT item 2b): the round-4
    # fermaware chain showed acceptance-selected flows can lose x1.5
    # topological mobility at equal cost; with --mob-probe-every > 0 the
    # trainer runs fthmc_tpu.mobility.mobility_probe on the era
    # checkpoint, records the curve, and keeps the best-by-mobility
    # params in <outdir>/checkpoints_bestmob.
    p.add_argument("--mob-probe-every", type=int, default=0,
                   help="probe mobility every K eras (0: off; the last "
                        "era is always probed when on)")
    p.add_argument("--mob-probe-mass", type=float, default=0.1,
                   help="fermion mass for the probe (0: quenched)")
    p.add_argument("--mob-probe-beta", type=float, default=None,
                   help="probe beta (default: --beta)")
    p.add_argument("--mob-probe-chains", type=int, default=128)
    p.add_argument("--mob-probe-ntraj", type=int, default=768)
    p.add_argument("--mob-probe-therm", type=int, default=256)
    p.add_argument("--mob-probe-nstep", type=int, default=4)
    p.add_argument("--mob-probe-tau", type=float, default=0.5)
    p.add_argument("--mob-probe-min-events", type=float, default=30,
                   help="statistics floor for the probe (auto-extends up "
                        "to --mob-probe-max-extra blocks); below-floor "
                        "probes are recorded but never select the best "
                        "checkpoint — the round-4 lesson about verdicts "
                        "on Poisson noise applies in-loop too")
    p.add_argument("--mob-probe-max-extra", type=int, default=8)
    p.add_argument("--platform", default=None, choices=["cpu"],
                   help="force the JAX platform (config-level override: "
                        "the axon sitecustomize ignores JAX_PLATFORMS env "
                        "— CLAUDE.md). Use for CPU smoke runs so they "
                        "don't contend with a production TPU scan.")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--init-ckpt", default=None,
                   help="warm-start: load flow params from this checkpoint "
                        "dir (spec must match) before training. Round-2 "
                        "staged-anneal recipe: init from the beta=3 flagship "
                        "flow and anneal 3 -> 5 instead of 2 -> 5 cold.")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    os.makedirs(args.outdir, exist_ok=True)
    spec = FlowSpec(n_layers=args.n_layers, coupling=args.coupling,
                    n_knots=args.n_knots, n_mixture=args.n_mixture,
                    hidden_sizes=tuple(args.hidden),
                    activation=args.activation, s_clip=args.s_clip)
    train_L = args.train_L or args.L
    cfg = TrainConfig(L=train_L, beta=args.beta, n_era=args.n_era,
                      n_epoch=args.n_epoch, batch_size=args.batch,
                      base_lr=args.lr, flow=spec, seed=args.seed,
                      with_force=args.with_force,
                      beta_init=args.beta_init,
                      beta_anneal_frac=args.anneal_frac,
                      grad_clip=args.grad_clip,
                      force_weight=args.force_weight,
                      ferm_mass=args.ferm_mass)
    state = init_train_state(jax.random.PRNGKey(cfg.seed), cfg)
    if args.init_ckpt:
        from fthmc_tpu.checkpoint import load_checkpoint
        loaded, meta = load_checkpoint(args.init_ckpt, state)
        # keep the fresh optimizer state (new lr / schedule), take params
        state = state._replace(params=loaded.params)
        print(f"warm-start from {args.init_ckpt} (meta={meta})", flush=True)
    print(f"flow: {args.coupling} K={args.n_knots} layers={args.n_layers} "
          f"hidden={args.hidden} params={count_parameters(state.params)}",
          flush=True)

    results = {"args": vars(args)}
    ckptdir = os.path.join(args.outdir, "checkpoints")
    if not args.skip_train:
        t0 = time.time()

        def cb(step, m):
            if step % 250 == 0:
                print(f"step {step}: dkl={m['loss_dkl']:.1f} "
                      f"ess={m['ess']:.4f} beta={m.get('beta', 0):.3f} "
                      f"plaq={m['plaq']:.4f}", flush=True)

        from fthmc_tpu.config import SchedulerConfig
        sched = (SchedulerConfig(factor=0.5, patience=30, cooldown=30)
                 if args.sched else None)

        mob_hist: list = []
        best_mob = {"era": -1, "B_mob_per_s": -1.0}

        def mob_ckfn(era, st, history):
            if args.mob_probe_every <= 0:
                return
            if ((era + 1) % args.mob_probe_every != 0
                    and era != cfg.n_era - 1):
                return
            from fthmc_tpu.mobility import mobility_probe
            pr = mobility_probe(
                st.params, spec, L=args.L,
                beta=(args.mob_probe_beta
                      if args.mob_probe_beta is not None else args.beta),
                mass=args.mob_probe_mass, n_chains=args.mob_probe_chains,
                ntraj=args.mob_probe_ntraj, therm=args.mob_probe_therm,
                tau=args.mob_probe_tau, nstep=args.mob_probe_nstep,
                min_events=args.mob_probe_min_events,
                max_extra_blocks=args.mob_probe_max_extra,
                key=jax.random.PRNGKey(911))
            pr["era"] = era
            mob_hist.append(pr)
            print(f"era {era}: mobility B*mob/s = "
                  f"{pr['B_mob_per_s']:.3g} +- "
                  f"{pr['B_mob_per_s_err']:.2g} (acc {pr['acc']:.3f}, "
                  f"{pr['n_events']:.0f} events"
                  f"{'' if pr['valid'] else ', BELOW FLOOR'})", flush=True)
            if pr["valid"] and pr["B_mob_per_s"] > best_mob["B_mob_per_s"]:
                best_mob.update(era=era,
                                B_mob_per_s=pr["B_mob_per_s"])
                save_checkpoint(ckptdir + "_bestmob", st, era=era,
                                epoch=cfg.n_epoch, train_cfg=cfg)

        state, hist = train(cfg, state, scheduler=sched, callback=cb,
                            checkpoint_fn=mob_ckfn)
        if mob_hist:
            results["mob_probes"] = mob_hist
            results["mob_best_era"] = best_mob["era"]
            print(f"best-by-mobility era: {best_mob['era']} "
                  f"({best_mob['B_mob_per_s']:.3g}) -> "
                  f"{ckptdir}_bestmob", flush=True)
        wall = time.time() - t0
        print(f"train wall {wall:.1f}s "
              f"({cfg.n_era * cfg.n_epoch / wall:.1f} steps/s)", flush=True)
        save_checkpoint(ckptdir, state, era=cfg.n_era - 1,
                        epoch=cfg.n_epoch, train_cfg=cfg)
        results["train"] = {
            "wall_s": wall,
            "ess_final": float(np.mean(hist["ess"][-20:])),
            "dkl_final": float(np.mean(hist["loss_dkl"][-20:]))}
        print("final ESS:", results["train"]["ess_final"], flush=True)
    else:
        from fthmc_tpu.checkpoint import find_and_load_checkpoint
        state, _ = find_and_load_checkpoint(ckptdir, state)

    # --- FT-HMC acceptance scan over nstep ---
    key = jax.random.PRNGKey(123)
    z0 = lattice.hot_start(key, args.eval_chains, args.L)
    results["fthmc"] = {}
    best = None
    for nstep in args.nsteps:
        lf = LeapfrogConfig(tau=args.tau, nstep=nstep)
        key, krun = jax.random.split(key)
        t0 = time.time()
        # chunked: single device executions > ~3 min kill the remote worker
        z, h = run_fthmc_chunked(state.params, spec, lf, beta=args.beta,
                                 ntraj=args.eval_ntraj, z0=z0, key=krun,
                                 block=16, integrator=args.integrator)
        jax.block_until_ready(z)
        wall = time.time() - t0
        t = args.eval_ntraj // 4
        r = {"acc": float(np.asarray(h.acc)[t:].mean()),
             "plaq": float(np.asarray(h.plaq)[t:].mean()),
             "exp_mdh": float(np.asarray(h.exp_mdh)[t:].mean()),
             "abs_dh": float(np.abs(np.asarray(h.dh)[t:]).mean()),
             "s_per_traj": wall / args.eval_ntraj}
        results["fthmc"][str(nstep)] = r
        print(f"FT-HMC nstep={nstep}: acc={r['acc']:.3f} "
              f"plaq={r['plaq']:.5f} |dH|={r['abs_dh']:.3f} "
              f"exact={lattice.PLAQ_EXACT.get(args.beta)}", flush=True)
        if r["acc"] > 0.35 and best is None:
            best = nstep

    # --- tau_int head-to-head at the first nstep with acc > 0.5 ---
    if best is not None:
        ntraj = 4096
        lf = LeapfrogConfig(tau=args.tau, nstep=best)
        key, k1, k2 = jax.random.split(key, 3)
        z, h = run_fthmc_chunked(state.params, spec, lf, beta=args.beta,
                                 ntraj=ntraj, z0=z0, key=k1, block=1024,
                                 integrator=args.integrator)
        q_ft = np.asarray(h.q)[ntraj // 4:]
        hcfg = HMCConfig(beta=args.beta, L=args.L, tau=args.tau, nstep=best,
                         ntraj=ntraj, n_chains=args.eval_chains,
                         randinit=True)
        x, hh = run_hmc(hcfg, key=k2)
        q_h = np.asarray(hh.q)[ntraj // 4:]
        ti_ft = float(np.mean([tau_int(q_ft[:, c])
                               for c in range(q_ft.shape[1])]))
        ti_h = float(np.mean([tau_int(q_h[:, c])
                              for c in range(q_h.shape[1])]))
        results["tau_int"] = {
            "nstep": best, "ntraj": ntraj,
            "fthmc": ti_ft, "hmc": ti_h,
            "speedup": ti_h / ti_ft,
            "chi_q_fthmc": float(np.mean(q_ft ** 2)),
            "chi_q_hmc": float(np.mean(q_h ** 2)),
            "acc_fthmc": float(np.asarray(h.acc)[ntraj // 4:].mean()),
            "acc_hmc": float(np.asarray(hh.acc)[ntraj // 4:].mean()),
        }
        print("tau_int:", json.dumps(results["tau_int"], indent=1),
              flush=True)

    with open(os.path.join(args.outdir, "results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    print("done ->", args.outdir, flush=True)


if __name__ == "__main__":
    main()
