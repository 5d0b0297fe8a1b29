#!/usr/bin/env python
"""A/B microbench: XLA roll-stencil vs fused Pallas CG (ops/pallas_fermion).

Measures, per (L, mass): one Mhat apply (eo), one full eo CG solve, both
backends, on thermalized beta=6 fields. Timing per the repo rules: distinct
inputs per repeat + device reduction + host transfer inside the timed
region (BENCH.md "Timing uses scalar-transfer fences").

    python experiments/dirac_bench.py --L 32 64 --mass 0.1 0.02 \
        --chains 64 --out runs/dirac_bench
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fthmc_tpu import fermion
from fthmc_tpu.ops import pallas_fermion as pf
from fthmc_tpu.schwinger import SchwingerConfig, _run_hmc_dyn_scan


def _sync(x):
    return float(jnp.sum(jnp.abs(x)))


def therm(key, L, beta, mass, chains, ntraj=64):
    """Same dynamical thermalization as experiments/cg_cost.py, so the
    numbers compare like-for-like with the cost-structure map."""
    cfg = SchwingerConfig(L=L, beta=beta, mass=mass, tau=1.0, nstep=16,
                          ntraj=ntraj, eo_precond=True)
    x = jax.random.uniform(key, (chains, 2, L, L), minval=-jnp.pi,
                           maxval=jnp.pi)
    x, _ = _run_hmc_dyn_scan(jax.random.PRNGKey(11), x, cfg, ntraj)
    return x


def bench_one(fn, inputs, reps):
    fn(*inputs[0])  # compile
    _sync(fn(*inputs[0]).x if hasattr(fn(*inputs[0]), "x")
          else fn(*inputs[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        r = fn(*inputs[i % len(inputs)])
        _sync(r.x if hasattr(r, "x") else r)
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, nargs="+", default=[32, 64])
    p.add_argument("--mass", type=float, nargs="+", default=[0.1, 0.02])
    p.add_argument("--beta", type=float, default=6.0)
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--tol", type=float, default=1e-9)
    p.add_argument("--out", default="runs/dirac_bench")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rows = []

    for L in args.L:
        key = jax.random.PRNGKey(17 + L)
        theta = therm(key, L, args.beta, max(args.mass), args.chains)
        print(f"L={L}: thermalized", flush=True)
        for mass in args.mass:
            phis = []
            for i in range(4):
                phi, _ = fermion.pf_refresh(jax.random.fold_in(key, 100 + i),
                                            theta, mass, eo=True)
                phis.append(phi)

            row = {"L": L, "mass": mass, "chains": args.chains}
            # single operator application
            for name, op in [
                ("xla", jax.jit(lambda t, v, m=mass:
                                fermion.apply_mdagm_eo(t, v, m))),
                ("fused", jax.jit(lambda t, v, m=mass:
                                  pf.pallas_mdagm(t, v, m, eo=True))),
            ]:
                dt = bench_one(op, [(theta, q) for q in phis], args.reps * 4)
                row[f"apply_{name}_ms"] = dt * 1e3
            # full solve
            for name, bk in [("xla", "xla"), ("fused", "fused")]:
                def solve(t, b, bk=bk, m=mass):
                    return fermion.cg_solve(t, b, m, tol=args.tol,
                                            maxiter=2000, eo=True,
                                            backend=bk)
                res = solve(theta, phis[0])
                dt = bench_one(solve, [(theta, q) for q in phis], args.reps)
                row[f"solve_{name}_ms"] = dt * 1e3
                row[f"iters_{name}"] = int(res.iters)
                row[f"rsq_{name}"] = float(jnp.max(res.rsq))
            row["apply_speedup"] = row["apply_xla_ms"] / row["apply_fused_ms"]
            row["solve_speedup"] = row["solve_xla_ms"] / row["solve_fused_ms"]
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump({"args": vars(args), "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
