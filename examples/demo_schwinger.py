#!/usr/bin/env python
"""Single-file walkthrough of the dynamical-fermion (two-flavor Schwinger
model) capability: plain pseudofermion HMC, FT-HMC with a transferred
pure-gauge flow, solver backends, and the fermionic observables.

Beyond-reference: nftqcd/fthmc is pure-gauge only; this is the
expensive-force regime its motivation paper (arXiv:2112.01586) targets.
Physics checks printed as it goes: <exp(-dH)> ~ 1 (exactness),
plain-vs-FT <plaq>/chi_Q agreement (cross-sampler validation — no
analytic value exists with fermions), gamma_5-hermiticity, and the pion
correlator's cosh shape.

    python examples/demo_schwinger.py [--quick] [--ckpt artifacts/...]

Runs in a few minutes on one TPU chip at the defaults (L=8); --quick
shrinks it for CPU smoke tests.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import fermion
from fthmc_tpu.schwinger import (SchwingerConfig, run_fthmc_dyn_chunked,
                                 run_hmc_dyn_chunked)


def summarize(tag, hist, therm):
    acc = float(np.asarray(hist.acc)[therm:].mean())
    emdh = float(np.asarray(hist.exp_mdh)[therm:].mean())
    plaq = float(np.asarray(hist.plaq)[therm:].mean())
    q = np.asarray(hist.q)[therm:]
    chi = float((q ** 2).mean())
    print(f"[{tag}] acc={acc:.3f} <exp(-dH)>={emdh:.4f} "
          f"<plaq>={plaq:.5f} chi_Q={chi:.3f}")
    return plaq, chi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--beta", type=float, default=3.0)
    ap.add_argument("--mass", type=float, default=0.2)
    ap.add_argument("--cg-backend", choices=["xla", "fused", "mixed"],
                    default="xla")
    ap.add_argument("--ckpt", default="artifacts/flow8x8_b3_rncp24_ftb6",
                    help="flow checkpoint for the FT-HMC leg (skipped if "
                         "missing)")
    ap.add_argument("--shard-rows", type=int, default=1,
                    help="also run the domain-decomposed plain chain over "
                         "this many devices (skipped if too few)")
    args = ap.parse_args()
    fermion.set_cg_backend(args.cg_backend)
    L, ntraj, chains = args.L, (64 if args.quick else 512), \
        (4 if args.quick else 32)
    therm = ntraj // 4
    print(f"devices: {jax.devices()}  backend: {args.cg_backend}")

    # gamma_5-hermiticity: <chi, D psi> == <D^dag chi, psi> exactly
    key = jax.random.PRNGKey(0)
    theta = jax.random.uniform(key, (2, L, L), minval=-np.pi, maxval=np.pi)
    k1, k2 = jax.random.split(key)
    psi = (jax.random.normal(k1, (L, L, 2)) +
           1j * jax.random.normal(k2, (L, L, 2))).astype(jnp.complex64)
    chi = (jax.random.normal(k2, (L, L, 2)) +
           1j * jax.random.normal(k1, (L, L, 2))).astype(jnp.complex64)

    @jax.jit
    def g5_check(theta, chi, psi):
        a = jnp.sum(jnp.conj(chi) * fermion.dirac(theta, psi, args.mass))
        b = jnp.sum(jnp.conj(fermion.dirac_dag(theta, chi, args.mass)) * psi)
        d = a - b
        return jnp.real(d) ** 2 + jnp.imag(d) ** 2
    print(f"gamma5-hermiticity |<chi,D psi> - <D^dag chi,psi>|^2 = "
          f"{float(g5_check(theta, chi, psi)):.2e}")

    cfg = SchwingerConfig(L=L, beta=args.beta, mass=args.mass, tau=1.0,
                          nstep=8 if args.quick else 16, n_chains=chains,
                          ntraj=ntraj)
    t0 = time.time()
    x, hist = run_hmc_dyn_chunked(cfg, block=min(ntraj, 128),
                                  key=jax.random.PRNGKey(1))
    jax.block_until_ready(x)
    p_plain, chi_plain = summarize("plain HMC", hist, therm)
    print(f"  ({(time.time() - t0) / ntraj * 1e3:.1f} ms/traj, "
          f"{chains} chains)")

    # pion correlator on the last configs: cosh-symmetric in t
    c = np.asarray(fermion.pion_correlator(x[:4], args.mass))
    sym = np.abs(c[:, 1:L // 2] - c[:, :-L // 2:-1]).mean() / c.mean()
    print(f"pion C(t) cosh-asymmetry (0 = exact): {sym:.3f}")

    if os.path.isdir(args.ckpt):
        from fthmc_tpu.checkpoint import load_checkpoint_auto
        from fthmc_tpu.models.flow import flow_reverse
        state, meta, spec, _ = load_checkpoint_auto(args.ckpt)
        print(f"FT-HMC with {spec.coupling} x{spec.n_layers} flow "
              f"(trained pure-gauge at 8^2, transferred unchanged)")
        cfg_ft = SchwingerConfig(L=L, beta=args.beta, mass=args.mass,
                                 tau=0.5, nstep=4 if args.quick else 8,
                                 n_chains=chains, ntraj=ntraj)
        z0, _ = flow_reverse(state.params, jnp.asarray(x), spec)
        z, hist_ft = run_fthmc_dyn_chunked(state.params, spec, cfg_ft,
                                           block=min(ntraj, 128), z0=z0,
                                           key=jax.random.PRNGKey(2))
        jax.block_until_ready(z)
        p_ft, chi_ft = summarize("FT-HMC", hist_ft, therm)
        print(f"cross-sampler <plaq> agreement: "
              f"|{p_plain:.5f} - {p_ft:.5f}| = {abs(p_plain - p_ft):.1e}")
    else:
        print(f"(no flow checkpoint at {args.ckpt}; FT-HMC leg skipped)")

    if args.shard_rows > 1:
        # domain decomposition: the same physics with the lattice ROW axis
        # sharded through the Dirac operator and the CG (halo exchange +
        # psum dots; parallel/domain_fermion.py). Needs >= shard_rows
        # devices — on a single TPU chip test with the virtual CPU mesh
        # (JAX_PLATFORMS handled by jax.config in tests/conftest.py).
        if jax.device_count() < args.shard_rows:
            print(f"(--shard-rows {args.shard_rows}: only "
                  f"{jax.device_count()} devices; leg skipped)")
        elif L % args.shard_rows or (L // args.shard_rows) % 2:
            print(f"(--shard-rows {args.shard_rows}: needs an even "
                  f"number of rows per shard at L={L}; leg skipped)")
        else:
            from fthmc_tpu.parallel.domain import make_rows_mesh
            from fthmc_tpu.parallel.domain_fermion import (
                run_domain_hmc_dyn_chunked)
            from fthmc_tpu.hmc import TrajMetrics
            xd, hd = run_domain_hmc_dyn_chunked(
                make_rows_mesh(args.shard_rows), cfg,
                block=min(ntraj, 128), key=jax.random.PRNGKey(3))
            p_dom, _ = summarize(f"plain HMC rows/{args.shard_rows}",
                                 TrajMetrics(**{k: np.asarray(v)
                                                for k, v in hd.items()}),
                                 therm)
            print(f"sharded-vs-single <plaq> agreement: "
                  f"|{p_plain:.5f} - {p_dom:.5f}| = "
                  f"{abs(p_plain - p_dom):.1e}")
    print("demo OK")


if __name__ == "__main__":
    main()
