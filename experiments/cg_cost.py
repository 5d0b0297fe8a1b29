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

Usage:
  python experiments/cg_cost.py --out runs/cg_cost --beta 6 \
      --L 16 32 --mass 0.1 0.05 0.02 --chains 128
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
    p.add_argument("--tol", type=float, default=1e-9)
    p.add_argument("--cg-maxiter", type=int, default=4000)
    p.add_argument("--repeat", type=int, default=4)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rows = []
    for L in args.L:
        # thermalize ONCE per L at the heaviest mass (field roughness is
        # set by beta/L; the mass scan reuses the same equilibrated field)
        cfg = SchwingerConfig(L=L, beta=args.beta, mass=max(args.mass),
                              tau=2.0, nstep=8, n_chains=args.chains,
                              cg_maxiter=args.cg_maxiter)
        x0 = jnp.zeros((args.chains, 2, L, L), jnp.float32)
        x, _ = _run_hmc_dyn_scan(jax.random.PRNGKey(11), x0, cfg, args.therm)
        float(jnp.sum(x))
        print(f"L={L}: thermalized {args.therm} traj", flush=True)

        for mass in args.mass:
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
                           chains=args.chains, tol=args.tol)
                rows.append(row)
                print(json.dumps(row), flush=True)
                with open(os.path.join(args.out, "cg_cost.json"), "w") as f:
                    json.dump({"args": vars(args), "rows": rows}, f,
                              indent=1)


if __name__ == "__main__":
    main()
