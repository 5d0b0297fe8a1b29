#!/usr/bin/env python
"""tau_int(Q) head-to-head at 16^2 beta=3: FT-HMC (rncp flow, Omelyan) vs
plain HMC - the round-2 flagship measurement (VERDICT item 1).

Steps: (1) validate bf16 convs at the production config (<exp(-dH)>~1 and
acceptance unchanged - exactness is flow-independent, bf16 only changes
WHICH flow is applied); (2) long chunked FT-HMC run; (3) plain-HMC baseline;
(4) tau_int + chi_Q for both.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.checkpoint import find_and_load_checkpoint
from fthmc_tpu.config import FlowSpec, HMCConfig, LeapfrogConfig, TrainConfig
from fthmc_tpu.hmc import run_fthmc_chunked, run_hmc
from fthmc_tpu.observables import tau_int
from fthmc_tpu.train import init_train_state

CKPT = "runs/b3_rncp8_t8_stable/checkpoints"
OUT = "runs/tauint_b3"
L, BETA, TAU, NSTEP = 16, 3.0, 1.0, 256
CHAINS, NTRAJ, THERM = 64, 768, 192

os.makedirs(OUT, exist_ok=True)


def load_flow(conv_dtype):
    spec = FlowSpec(n_layers=24, coupling="rncp", n_mixture=8,
                    hidden_sizes=(32, 32), s_clip=3.0, conv_dtype=conv_dtype)
    cfg = TrainConfig(L=8, beta=BETA, flow=spec, grad_clip=1.0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state, meta = find_and_load_checkpoint(CKPT, state)
    return spec, state.params


def mean_tau_int(q):
    return float(np.mean([tau_int(q[:, c]) for c in range(q.shape[1])]))


results = {}
lf = LeapfrogConfig(tau=TAU, nstep=NSTEP)
key = jax.random.PRNGKey(777)

# 1. bf16 gate: short run, compare acc/exp_mdh to the fp32 short run
for cd in ("float32", "bfloat16"):
    spec, params = load_flow(cd)
    key, k = jax.random.split(key)
    z0 = lattice.hot_start(jax.random.PRNGKey(5), 32, L)
    t0 = time.time()
    z, h = run_fthmc_chunked(params, spec, lf, beta=BETA, ntraj=48, z0=z0,
                             key=k, block=24, integrator="omelyan")
    wall = time.time() - t0
    r = {"acc": float(np.asarray(h.acc)[12:].mean()),
         "exp_mdh": float(np.asarray(h.exp_mdh)[12:].mean()),
         "s_per_traj": wall / 48}
    results[f"gate_{cd}"] = r
    print(f"gate {cd}: {r}", flush=True)

ok_bf16 = (abs(results["gate_bfloat16"]["exp_mdh"] - 1.0) < 0.15
           and results["gate_bfloat16"]["acc"]
           > 0.7 * results["gate_float32"]["acc"])
cd = "bfloat16" if ok_bf16 else "float32"
print("production conv_dtype:", cd, flush=True)

# 2. FT-HMC production run
spec, params = load_flow(cd)
key, k = jax.random.split(key)
z0 = lattice.hot_start(jax.random.PRNGKey(9), CHAINS, L)
t0 = time.time()


def cb(done, block):
    print(f"  traj {done}: acc={np.asarray(block.acc).mean():.3f} "
          f"plaq={np.asarray(block.plaq)[-16:].mean():.5f} "
          f"({(time.time()-t0)/done:.2f} s/traj)", flush=True)


z, h = run_fthmc_chunked(params, spec, lf, beta=BETA, ntraj=NTRAJ, z0=z0,
                         key=k, block=64, callback=cb, integrator="omelyan")
q_ft = np.asarray(h.q)[THERM:]
results["fthmc"] = {
    "nstep": NSTEP, "integrator": "omelyan", "conv_dtype": cd,
    "ntraj": NTRAJ, "chains": CHAINS,
    "acc": float(np.asarray(h.acc)[THERM:].mean()),
    "exp_mdh": float(np.asarray(h.exp_mdh)[THERM:].mean()),
    "plaq": float(np.asarray(h.plaq)[THERM:].mean()),
    "tau_int_q": mean_tau_int(q_ft),
    "chi_q": float(np.mean(q_ft ** 2)),
    "wall_s": time.time() - t0,
}
print("FT-HMC:", json.dumps(results["fthmc"], indent=1), flush=True)
np.savez_compressed(os.path.join(OUT, "fthmc_q.npz"), q=np.asarray(h.q))

# 3. plain-HMC baseline (matched tau; nstep for ~0.99 acceptance)
hcfg = HMCConfig(beta=BETA, L=L, tau=TAU, nstep=32, ntraj=8192,
                 n_chains=128, randinit=True, seed=31)
key, k2 = jax.random.split(key)
x, hh = run_hmc(hcfg, key=k2)
jax.block_until_ready(x)
q_h = np.asarray(hh.q)[2048:]
results["hmc"] = {
    "nstep": 32, "ntraj": 8192, "chains": 128,
    "acc": float(np.asarray(hh.acc)[2048:].mean()),
    "plaq": float(np.asarray(hh.plaq)[2048:].mean()),
    "tau_int_q": mean_tau_int(q_h),
    "chi_q": float(np.mean(q_h ** 2)),
}
print("HMC:", json.dumps(results["hmc"], indent=1), flush=True)
results["speedup_tau_int"] = (results["hmc"]["tau_int_q"]
                              / results["fthmc"]["tau_int_q"])
print("tau_int speedup:", results["speedup_tau_int"], flush=True)

with open(os.path.join(OUT, "results.json"), "w") as f:
    json.dump(results, f, indent=2, default=float)
print("done ->", OUT, flush=True)
