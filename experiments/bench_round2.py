#!/usr/bin/env python
"""Round-2 benchmark sweep on the real chip.

Measures (one JSON line per row, appended to --out):
  1. plain-HMC chain-steps/s at the north-star config (64^2, beta=6, 1024
     chains, tau=1 nstep=25) for backends: xla / pallas (chains-first) /
     fused (in-kernel RNG + Metropolis).
  2. the same at nstep=10 (short-trajectory regime where per-traj overhead
     matters most - the fused kernel's best case).
  3. FT-HMC chain-steps/s at 8^2/16^2 (16-layer reference-arch flow),
     fp32 vs bf16 convs (FlowSpec.conv_dtype row for BENCH.md).

Timing fences: device-reduction + host transfer inside the timed region,
distinct keys per repeat (the remote terminal dedupes identical executions;
see fthmc_tpu/bench.py::_sync).
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
from fthmc_tpu.config import FlowSpec, HMCConfig, LeapfrogConfig
from fthmc_tpu.hmc import run_fthmc, run_hmc
from fthmc_tpu.models.flow import init_flow_params


def _sync(x):
    return float(jnp.sum(x))


def bench_hmc_backend(backend, L=64, chains=1024, beta=6.0, tau=1.0,
                      nstep=25, ntraj=20, repeats=5):
    cfg = HMCConfig(beta=beta, L=L, tau=tau, nstep=nstep, ntraj=ntraj,
                    n_chains=chains, randinit=False, seed=0)
    x, _ = run_hmc(cfg, backend=backend)
    _sync(x)
    times = []
    for i in range(repeats):
        key = jax.random.PRNGKey(1000 + i)
        t0 = time.perf_counter()
        x, _ = run_hmc(cfg, x0=x, key=key, backend=backend)
        _sync(x)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {"metric": f"hmc_chain_steps_per_sec_L{L}_n{nstep}_{backend}",
            "value": chains * ntraj * nstep / dt, "unit": "chain-steps/s",
            "median_s": dt}


def bench_fthmc(L, conv_dtype, chains=1024, beta=2.0, nstep=16, ntraj=4,
                repeats=3, n_layers=16):
    spec = FlowSpec(n_layers=n_layers, n_mixture=2, hidden_sizes=(8, 8),
                    conv_dtype=conv_dtype)
    params = init_flow_params(jax.random.PRNGKey(0), spec)
    lf = LeapfrogConfig(tau=1.0, nstep=nstep)
    z = lattice.hot_start(jax.random.PRNGKey(1), chains, L)
    z, _ = run_fthmc(params, spec, lf, beta=beta, ntraj=ntraj, z0=z,
                     key=jax.random.PRNGKey(2))
    _sync(z)
    times = []
    for i in range(repeats):
        key = jax.random.PRNGKey(3000 + i)
        t0 = time.perf_counter()
        z, _ = run_fthmc(params, spec, lf, beta=beta, ntraj=ntraj, z0=z,
                         key=key)
        _sync(z)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {"metric": f"fthmc_chain_steps_per_sec_L{L}_{conv_dtype}",
            "value": chains * ntraj * nstep / dt, "unit": "chain-steps/s",
            "median_s": dt}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/bench_round2.jsonl")
    p.add_argument("--which", default="all",
                   choices=["all", "hmc", "fthmc"])
    args = p.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    rows = []
    if args.which in ("all", "hmc"):
        for nstep in (25, 10):
            for backend in ("xla", "pallas", "fused"):
                r = bench_hmc_backend(backend, nstep=nstep)
                rows.append(r)
                print(json.dumps(r), flush=True)
    if args.which in ("all", "fthmc"):
        for L in (8, 16):
            for cd in ("float32", "bfloat16"):
                r = bench_fthmc(L, cd)
                rows.append(r)
                print(json.dumps(r), flush=True)
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
