#!/usr/bin/env python
"""CG cost structure for the Schwinger model: iterations + wall per solve
as a function of (L, mass), eo vs full operator, at thermalized fields.

ROADMAP round-3 "remaining" item 1: the 16^2 m >= 0.02 scans found the
eo-preconditioned Wilson solve stays cheap at any practical mass, so the
MTS/Hasenbusch payoff regime needs VOLUME (rougher fields per solve), not
just lighter mass. This measures that directly: iterations-to-tolerance and
in-scan per-solve wall across the (L, m) grid, from fields thermalized by
the production sampler itself — the number that decides whether removing
solves from the fine timescale can pay at all.

Also answers the mixed-precision-CG question the TPU way: reports the
wall-per-iteration alongside iterations, separating latency-bound (small
fields; while_loop overhead dominates -> bf16 cannot help) from
throughput-bound (large L*B working sets) regimes.

HONESTY FIX (round-3 session-9): the first two maps (cg_cost_b6 /
cg_cost_light) thermalized with tau=2/nstep=8 from a COLD start — dt=1/4
is below the measured acceptance cliff at L >= 32 (acc 0.05 at m=0.1,
exactly 0.0 at m=0.02; verified on CPU), so those L>=32 rows measured the
near-free Wilson operator on ordered fields, which is also why their
light-mass iteration counts looked mass-independent. This version
(a) warm-starts from a production run_state.npz per L when given
(--state L:PATH), (b) re-thermalizes PER MASS at a safe dt
(--therm-tau/--therm-nstep, default tau=1/nstep=16 -> dt=1/16), and
(c) records the re-therm acceptance + plaquette in every row so the
artifact is self-validating.

Usage:
  python experiments/cg_cost.py --out runs/cg_cost --beta 6 \
      --L 16 32 --mass 0.1 0.05 0.02 --chains 128 \
      --state 32:runs/schw_L32_plain_n10/run_state.npz
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

from fthmc_tpu import fermion
from fthmc_tpu.schwinger import SchwingerConfig, _run_hmc_dyn_scan


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--beta", type=float, default=6.0)
    p.add_argument("--L", type=int, nargs="+", default=[16, 32])
    p.add_argument("--mass", type=float, nargs="+", default=[0.1, 0.05, 0.02])
    p.add_argument("--chains", type=int, default=128)
    p.add_argument("--therm", type=int, default=64)
    p.add_argument("--therm-tau", type=float, default=1.0)
    p.add_argument("--therm-nstep", type=int, default=16)
    p.add_argument("--state", action="append", default=[],
                   help="L:PATH of a run_state.npz to warm-start that L")
    p.add_argument("--tol", type=float, default=1e-9)
    p.add_argument("--cg-maxiter", type=int, default=4000)
    p.add_argument("--repeat", type=int, default=4)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    states = {}
    for s in args.state:
        Ls, path = s.split(":", 1)
        states[int(Ls)] = path

    from fthmc_tpu import lattice

    rows = []
    for L in args.L:
        if L in states:
            z = np.load(states[L])["z"]
            xL = jnp.asarray(z[: args.chains], jnp.float32)
            start = f"warm:{states[L]}"
        else:
            xL = jnp.zeros((args.chains, 2, L, L), jnp.float32)
            start = "cold"
        B = int(xL.shape[0])

        for mass in args.mass:
            # re-thermalize at THIS mass at a safe dt (dt=1/4 from cold is
            # below the L>=32 acceptance cliff — see module docstring)
            cfg = SchwingerConfig(L=L, beta=args.beta, mass=mass,
                                  tau=args.therm_tau, nstep=args.therm_nstep,
                                  n_chains=B, cg_maxiter=args.cg_maxiter)
            x, hist = _run_hmc_dyn_scan(jax.random.PRNGKey(11), xL, cfg,
                                        args.therm)
            therm_acc = float(jnp.mean(hist.acc))
            therm_plaq = float(jnp.mean(lattice.batch_plaq_mean(x)))
            print(f"L={L} m={mass}: {args.therm} therm traj from {start}, "
                  f"acc {therm_acc:.3f}, plaq {therm_plaq:.5f}", flush=True)

            for eo in (True, False):
                key = jax.random.PRNGKey(17)
                phi, _ = fermion.pf_refresh(key, x, mass, eo=eo)

                # compile + measure iterations (unjitted int out of CGResult)
                res = fermion.cg_solve(x, phi, mass, tol=args.tol,
                                       maxiter=args.cg_maxiter, eo=eo)
                iters = int(res.iters)
                rmax = float(jnp.max(res.rsq))

                # in-loop wall: distinct RHS per repeat (dedup!) + host sync
                keys = jax.random.split(jax.random.PRNGKey(23), args.repeat)
                phis = [fermion.pf_refresh(k, x, mass, eo=eo)[0]
                        for k in keys]
                float(jnp.sum(jnp.real(phis[-1])))
                t0 = time.time()
                for ph in phis:
                    r = fermion.cg_solve(x, ph, mass, tol=args.tol,
                                         maxiter=args.cg_maxiter, eo=eo)
                    float(jnp.max(r.rsq))
                wall = (time.time() - t0) / args.repeat
                row = dict(L=L, mass=mass, eo=eo, iters=iters,
                           rsq_max=rmax, wall_per_solve=wall,
                           wall_per_iter=wall / max(iters, 1),
                           chains=B, tol=args.tol, start=start,
                           therm_acc=therm_acc, therm_plaq=therm_plaq)
                rows.append(row)
                print(json.dumps(row), flush=True)
                with open(os.path.join(args.out, "cg_cost.json"), "w") as f:
                    json.dump({"args": vars(args), "rows": rows}, f,
                              indent=1)


if __name__ == "__main__":
    main()
