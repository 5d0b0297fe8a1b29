#!/usr/bin/env python
"""Profile-directed decomposition of the production 64^2 FT-HMC step
(round-4 judge item 7): where does the x8.3 FT-vs-plain trajectory cost
at 64^2 actually go, and which lever (remat granularity, conv dtype,
accumulation) is worth pulling?

Times each component of the dynamical FT-HMC force/step SEPARATELY as its
own warmed jitted program (chained inputs against execution dedup, device
reduction + transfer fences) at the production 64^2 config (flagship ftb6
flow, bf16 convs, B=32, beta/mass from the verdict cell):

  flow_fwd      one flow_forward (y, logdet)
  vjp_gauge     ft_gauge_force: VJP pullback incl. gauge+logdet cotangent
  cg_force      one warm-start fused CG solve at force tolerance
  force_full    ft_dyn_force (flow VJP + CG + fermion-force pullback)
  step          one full fthmc_step_dyn trajectory (nstep Omelyan)

plus A/B variants: remat on/off for the VJP, conv fp32 vs bf16, and (if
jax.profiler works through the tunnel) an XLA trace dump.

Usage:
  python experiments/profile_ft64.py --out runs/r5_profile64 \
      [--L 64 --beta 9 --mass 0.1 --chains 32 --nstep 12]
"""
import argparse
import dataclasses
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
from fthmc_tpu.models.flow import flow_forward, flow_reverse
from fthmc_tpu.schwinger import (SchwingerConfig, _run_fthmc_dyn_scan,
                                 ft_dyn_force, ft_gauge_force,
                                 fthmc_step_dyn)


def timed(fn, args, chain, reps=5):
    """Median wall of a warmed jitted fn. `chain(args, out) -> args` MUST
    return fresh inputs every rep: the axon terminal dedups identical
    remote executions (CLAUDE.md), so repeating the same args times the
    RPC cache, not the compute. Every call site perturbs its input at
    1e-6 scale (cost-neutral: CG iteration counts and conv work are
    insensitive to it) or feeds the previous output forward."""
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))                       # warmup + fence
    args = chain(args, out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        times.append(time.perf_counter() - t0)
        args = chain(args, out)
    return float(np.median(times))


def _jitter0(args, out):
    """Chain helper: nudge the first array arg by a cost-neutral 1e-6
    perturbation derived from the OUTPUT (forces real execution — the
    next input depends on the previous result, so dedup cannot fire)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    bump = 1e-6 * (1.0 + jnp.tanh(jnp.sum(leaf).astype(jnp.float32)
                                  * 1e-6))
    return (args[0] + bump,) + tuple(args[1:])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/flow8x8_b3_rncp24_ftb6")
    p.add_argument("--L", type=int, default=64)
    p.add_argument("--beta", type=float, default=9.0)
    p.add_argument("--mass", type=float, default=0.1)
    p.add_argument("--chains", type=int, default=32)
    p.add_argument("--nstep", type=int, default=12)
    p.add_argument("--tau", type=float, default=0.5)
    p.add_argument("--cg-maxiter", type=int, default=2000)
    p.add_argument("--cg-backend", default="fused")
    p.add_argument("--therm", type=int, default=32)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--trace", action="store_true",
                   help="also dump a jax.profiler trace (may not work "
                        "through the axon tunnel)")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    fermion.set_cg_backend(args.cg_backend)

    st, meta, spec0, _ = load_checkpoint_auto(args.ckpt)
    params = st.params
    specs = {"bf16": dataclasses.replace(spec0, conv_dtype="bfloat16"),
             "fp32": dataclasses.replace(spec0, conv_dtype="float32")}
    spec = specs["bf16"]
    L, B = args.L, args.chains
    cfg = SchwingerConfig(L=L, beta=args.beta, mass=args.mass,
                          tau=args.tau, nstep=args.nstep, n_chains=B,
                          ntraj=0, cg_maxiter=args.cg_maxiter)

    # typical state: cold start + a few untimed trajectories
    z = flow_reverse(params, jnp.zeros((B, 2, L, L), jnp.float32), spec)[0]
    z, _ = _run_fthmc_dyn_scan(params, spec, jax.random.PRNGKey(5), z,
                               cfg, args.therm)
    float(jnp.sum(z))
    print(f"thermalized {args.therm} traj", flush=True)
    y, _ = flow_forward(params, z, spec, remat=False)
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(6), y, cfg.mass,
                                eo=cfg.eo_precond)
    guess = jnp.zeros_like(phi)

    results = {"args": vars(args)}

    def rec(name, t, per="call"):
        results[name] = t
        print(f"  {name:>22}: {1e3 * t:8.2f} ms/{per}", flush=True)

    fwd = jax.jit(lambda zz: flow_forward(params, zz, spec, remat=False))
    rec("flow_fwd", timed(fwd, (z,), _jitter0, reps=args.reps))

    for tag, rm in (("vjp_gauge_noremat", False), ("vjp_gauge_remat", True)):
        g = jax.jit(lambda zz, rm=rm: ft_gauge_force(params, spec, zz,
                                                     cfg.beta, rm))
        rec(tag, timed(g, (z,), _jitter0, reps=args.reps))

    cg = jax.jit(lambda yy: fermion.cg_solve(
        yy, phi, cfg.mass, guess, tol=cfg.cg_tol_force,
        maxiter=cfg.cg_maxiter, eo=cfg.eo_precond).x)
    rec("cg_force_coldguess", timed(cg, (y,), _jitter0, reps=args.reps))
    res = fermion.cg_solve(y, phi, cfg.mass, guess, tol=cfg.cg_tol_force,
                           maxiter=cfg.cg_maxiter, eo=cfg.eo_precond)
    cg_w = jax.jit(lambda yy, g0: fermion.cg_solve(
        yy, phi, cfg.mass, g0, tol=cfg.cg_tol_force,
        maxiter=cfg.cg_maxiter, eo=cfg.eo_precond).x)
    # warm-guess chain: jitter the field AND feed the previous solution
    # forward as the next guess (still a warm guess for the jittered
    # system; execution is forced because inputs depend on the output)
    rec("cg_force_warmguess",
        timed(cg_w, (y, res.x),
              lambda a, out: (_jitter0((a[0],), out)[0], out),
              reps=args.reps))

    ff = jax.jit(lambda zz: ft_dyn_force(params, spec, zz, cfg, phi,
                                         res.x, False)[0])
    rec("force_full", timed(ff, (z,), _jitter0, reps=args.reps))

    for tag in ("bf16", "fp32"):
        sp = specs[tag]
        stepf = jax.jit(lambda k, zz, q, sp=sp: fthmc_step_dyn(
            params, sp, k, zz, q, cfg)[0])
        q0 = lattice.batch_charges(flow_forward(params, z, sp,
                                                remat=False)[0])
        # feed the accepted state forward: a real chain, never deduped
        t = timed(stepf, (jax.random.PRNGKey(8), z, q0),
                  lambda a, out: (a[0], out, a[2]), reps=args.reps)
        rec(f"step_traj_{tag}", t, per="traj")
        results[f"step_per_force_{tag}"] = t / (2 * args.nstep)

    if args.trace:
        try:
            with jax.profiler.trace(os.path.join(args.out, "trace")):
                for _ in range(3):
                    z2 = ff(z)
                float(jnp.sum(z2))
            results["trace"] = "ok"
        except Exception as e:
            results["trace"] = f"failed: {e}"
            print(f"trace failed: {e}", flush=True)

    with open(os.path.join(args.out, "profile.json"), "w") as f:
        json.dump(results, f, indent=1, default=float)
    print("->", os.path.join(args.out, "profile.json"), flush=True)


if __name__ == "__main__":
    main()
