#!/usr/bin/env python
"""Clean-window A/B of the FT-HMC force backends (XLA autodiff vs fused
Pallas VJP kernels) + whole-step rates + physics equivalence. Run when the
TPU is otherwise idle (timings are worthless under contention)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu.bench import bench_fthmc_force_backends, bench_fthmc_leapfrog
from fthmc_tpu.config import FlowSpec, LeapfrogConfig
from fthmc_tpu.hmc import run_fthmc
from fthmc_tpu.models.flow import init_flow_params


def main():
    out = {}
    # whole FT-HMC step rate, both backends (the VERDICT 2x criterion).
    # L=16 runs at 128 chains (the kernel's VMEM envelope).
    for fb in ("xla", "pallas"):
        r = bench_fthmc_leapfrog(L=8, chains=1024, nstep=64, ntraj=4,
                                 force_backend=fb)
        out[f"fthmc_L8_{fb}"] = r
        print(json.dumps(r), flush=True)
    for fb in ("xla", "pallas"):
        r = bench_fthmc_leapfrog(L=16, chains=128, nstep=64, ntraj=4,
                                 force_backend=fb)
        out[f"fthmc_L16_{fb}"] = r
        print(json.dumps(r), flush=True)

    # force-only A/B at the reference architecture sizes (VERDICT item 3's
    # 2x criterion lives at hidden (8,8)). L=16/B=1024 is outside the
    # kernel's validated VMEM envelope (Mosaic stack OOM) - gated off.
    for L, chains in [(8, 1024), (16, 128)]:
        r = bench_fthmc_force_backends(L=L, chains=chains, n_layers=16,
                                       n_mixture=6, hidden=(8, 8),
                                       coupling="rncp", reps=30)
        out[f"force_L{L}_B{chains}_h8"] = r
        print(json.dumps(r), flush=True)
    # flagship width: XLA only (Pallas gated off by VMEM estimate)
    r = bench_fthmc_force_backends(L=16, chains=64, n_layers=24,
                                   n_mixture=8, hidden=(32, 32),
                                   coupling="rncp", reps=15)
    out["force_L16_B64_h32"] = r
    print(json.dumps(r), flush=True)

    # physics equivalence: same key, both backends
    spec = FlowSpec(n_layers=16, coupling="rncp", n_mixture=6,
                    hidden_sizes=(8, 8), s_clip=3.0)
    params = init_flow_params(jax.random.PRNGKey(5), spec)
    z0 = jax.random.uniform(jax.random.PRNGKey(3), (128, 2, 16, 16),
                            jnp.float32, -np.pi, np.pi)
    lf = LeapfrogConfig(tau=1.0, nstep=32)
    phys = {}
    for fb in ("pallas", "xla"):
        _, h = run_fthmc(params, spec, lf, beta=3.0, ntraj=64, z0=z0,
                         key=jax.random.PRNGKey(9), force_backend=fb)
        phys[fb] = {"acc": float(np.asarray(h.acc).mean()),
                    "exp_mdh": float(np.asarray(h.exp_mdh).mean()),
                    "plaq_last": float(np.asarray(h.plaq)[-8:].mean())}
        print(fb, phys[fb], flush=True)
    out["physics"] = phys

    with open("runs/bench_force_ab.json", "w") as f:
        json.dump(out, f, indent=2, default=float)
    print("done -> runs/bench_force_ab.json", flush=True)


if __name__ == "__main__":
    main()
