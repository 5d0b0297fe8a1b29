#!/usr/bin/env python
"""Resilient long Schwinger-model production runs for tau_int(Q).

Thin harness over the packaged block+persist+resume+watchdog driver
(fthmc_tpu.runner.run_resilient — the remote worker dies on long
executions): runs plain dynamical HMC or FT-HMC (--ckpt) in small
compiled blocks, persists (state, q history) after every block, resumes
from the last good block on a crash. The state-file layout is the
runner's, so runs started before the packaging resume unchanged.

The headline round-3 capstone measurement: at (16^2, beta=5, m=0.1) the
force is a CG solve, so the FT/plain cost ratio collapses from the
pure-gauge ~1100x to a few x while the tau_int(Q) ratio persists -> FT-HMC
wins WALL-CLOCK per effective sample (BENCH.md round-3 Schwinger section).
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

from fthmc_tpu import fermion, lattice
from fthmc_tpu.checkpoint import load_checkpoint_auto
from fthmc_tpu.observables import chain_stats
from fthmc_tpu.runner import run_resilient
from fthmc_tpu.schwinger import (SchwingerConfig, _run_fthmc_dyn_scan,
                                 _run_hmc_dyn_scan)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="flow checkpoint -> FT-HMC; omit for plain HMC")
    p.add_argument("--conv-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="override the flow's conv dtype (bfloat16 is the "
                        "measured production recipe at L >= 64)")
    p.add_argument("--out", required=True)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, default=5.0)
    p.add_argument("--mass", type=float, default=0.1)
    p.add_argument("--tau", type=float, default=0.5)
    p.add_argument("--nstep", type=int, default=24)
    p.add_argument("--integrator", default="omelyan")
    p.add_argument("--n-inner", type=int, default=0,
                   help="multi-timescale: nstep=outer fermion kicks, each "
                        "with N inner gauge(-flow) Omelyan steps")
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--ntraj", type=int, default=4096)
    p.add_argument("--block", type=int, default=128)
    p.add_argument("--therm-frac", type=float, default=0.25)
    p.add_argument("--start", choices=["hot", "cold"], default="cold")
    p.add_argument("--init-state", default=None,
                   help="run_state.npz with thermalized PHYSICAL configs "
                        "('z' key of a plain chain) to start from; for FT "
                        "runs they are mapped to latent space with the "
                        "flow inverse. Overrides --start; ignored when "
                        "resuming. Pair with a small --therm-frac.")
    p.add_argument("--block-timeout", type=int, default=900,
                   help="max wall seconds per block before assuming a "
                        "silent TPU-worker death (first block; later "
                        "blocks use 6x their own measured wall)")
    p.add_argument("--no-eo", action="store_true",
                   help="disable even-odd preconditioning")
    p.add_argument("--hasenbusch-dm", type=float, default=0.0,
                   help="Hasenbusch split at m1 = mass + dm (plain only; "
                        "3-level nested Omelyan, requires --n-inner >= 1)")
    p.add_argument("--n-mid", type=int, default=1,
                   help="heavy-term steps per outer drift (Hasenbusch)")
    p.add_argument("--min-ntau", type=float, default=0,
                   help="statistics floor (round-4): auto-extend the chain "
                        "until the post-therm length is >= this many "
                        "tau_int (40 = the BENCH.md convergence rule: "
                        "shorter chains read tau 25-30% low); rows below "
                        "the floor are flagged valid=false either way")
    p.add_argument("--max-extra-wall", type=float, default=0,
                   help="wall budget (s) for the --min-ntau extension")
    p.add_argument("--cg-maxiter", type=int, default=1000)
    p.add_argument("--cg-backend", choices=["xla", "fused", "mixed"],
                   default="xla",
                   help="fermion CG operator backend (fused = Pallas VMEM\n                   kernel, ops/pallas_fermion.py)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    fermion.set_cg_backend(args.cg_backend)

    cfg = SchwingerConfig(L=args.L, beta=args.beta, mass=args.mass,
                          tau=args.tau, nstep=args.nstep,
                          n_chains=args.chains, ntraj=args.ntraj,
                          integrator=args.integrator,
                          eo_precond=not args.no_eo, n_inner=args.n_inner,
                          hasenbusch_dm=args.hasenbusch_dm,
                          n_mid=args.n_mid, cg_maxiter=args.cg_maxiter)
    ft = args.ckpt is not None
    if ft:
        state_f, meta, spec, _ = load_checkpoint_auto(args.ckpt)
        if args.conv_dtype:
            import dataclasses
            spec = dataclasses.replace(spec, conv_dtype=args.conv_dtype)
        params = state_f.params
        print(f"flow restored: {spec.coupling} x{spec.n_layers} "
              f"(conv {spec.conv_dtype})", flush=True)

    key = jax.random.PRNGKey(20260817)
    state_path = os.path.join(args.out, "run_state.npz")
    if os.path.exists(state_path):
        # z0/key here are placeholders; run_resilient resumes from the file
        print(f"resuming at traj {int(np.load(state_path)['done'])}",
              flush=True)
        z = jnp.zeros((args.chains, 2, args.L, args.L), jnp.float32)
    elif args.init_state is not None:
        x = np.load(args.init_state)["z"]
        if x.shape[0] < args.chains:
            x = np.tile(x, (-(-args.chains // x.shape[0]), 1, 1, 1))
        x = jnp.asarray(x[:args.chains])
        if ft:
            from fthmc_tpu.models.flow import flow_reverse
            z, _ = flow_reverse(params, x, spec)
        else:
            z = x
        print(f"thermalized init from {args.init_state}", flush=True)
    elif args.start == "cold":
        if ft:
            from fthmc_tpu.models.flow import flow_reverse
            z, _ = flow_reverse(params, jnp.zeros(
                (args.chains, 2, args.L, args.L)), spec)
        else:
            z = jnp.zeros((args.chains, 2, args.L, args.L), jnp.float32)
    else:
        z = lattice.hot_start(jax.random.PRNGKey(9), args.chains, args.L)

    t0 = time.time()

    def scan_fn(krun, z, n):
        if ft:
            return _run_fthmc_dyn_scan(params, spec, krun, z, cfg, n)
        return _run_hmc_dyn_scan(krun, z, cfg, n)

    def progress(done, h):
        if done % (4 * args.block) == 0 or done == args.ntraj:
            acc = float(np.asarray(h.acc).mean())
            pl = float(np.asarray(h.plaq)[-1].mean())
            print(f"  traj {done}/{args.ntraj}: acc={acc:.3f} "
                  f"plaq={pl:.5f}", flush=True)

    z, hist, info = run_resilient(
        scan_fn, z, key=key, ntraj=args.ntraj, block=args.block,
        state_path=state_path, block_timeout=args.block_timeout,
        on_block=progress)

    # statistics-floor auto-extension: thermalization stays the ORIGINAL
    # cut (new trajectories are statistics, not burn-in); each pass grows
    # the target 25% and resumes through the same persisted state, so a
    # crash mid-extension loses at most one block.
    therm = int(args.ntraj * args.therm_frac)
    ntraj_target = args.ntraj
    t_ext0 = time.time()
    while args.min_ntau > 0:
        st = chain_stats(np.asarray(hist["q"])[therm:])
        ntau = st["ntraj_used"] / max(st["tau_int_q"], 1e-9)
        if (ntau >= args.min_ntau
                or time.time() - t_ext0 >= args.max_extra_wall):
            break
        ntraj_target += max(args.block, int(0.25 * ntraj_target))
        print(f"  below {args.min_ntau:.0f}-tau floor "
              f"({ntau:.1f}t); extending to {ntraj_target}", flush=True)
        z, hist, info = run_resilient(
            scan_fn, z, key=key, ntraj=ntraj_target, block=args.block,
            state_path=state_path, block_timeout=args.block_timeout,
            on_block=progress)

    q = np.asarray(hist["q"])[therm:]
    res = {
        "config": vars(args),
        "sampler": "fthmc" if ft else "hmc",
        "acc": float(np.asarray(hist["acc"])[therm:].mean()),
        "exp_mdh": float(np.asarray(hist["exp_mdh"])[therm:].mean()),
        "plaq": float(np.asarray(hist["plaq"])[therm:].mean()),
        "wall_s": time.time() - t0,
        "s_per_traj": info["s_per_traj"],
        **chain_stats(q),
    }
    res["ntau"] = res["ntraj_used"] / max(res["tau_int_q"], 1e-9)
    res["valid"] = bool(args.min_ntau <= 0 or res["ntau"] >= args.min_ntau)
    res["ntraj_final"] = ntraj_target
    from fthmc_tpu.diagnostics import sanity_report
    rep = sanity_report(hist, therm_frac=args.therm_frac)
    if not rep["ok"]:
        res["sanity_flags"] = rep["flags"]
    print(json.dumps(res, indent=1, default=str), flush=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(res, f, indent=2, default=str)


if __name__ == "__main__":
    main()
