"""Standardized topological-mobility probe: the round-4 selection metric.

Round-4's central negative result (BENCH.md, fermaware section): smoothness
objectives can RAISE acceptance while LOWERING topological mobility — the
fermion-aware flow beat the production ftb6 flow on acceptance at equal
cost (0.714 vs 0.675) yet moved topology x1.5 SLOWER (B*mob/s 24.8 vs
37.8). Acceptance and ESS are therefore the WRONG selection metrics for
flow candidates; wall-clock mobility (B*mob/s = tunneling events per
wall-second across the chain ensemble) is the right one, and in round 4 it
was only measurable via hours-long downstream A/B scans.

This module packages that statistic as a cheap fixed-budget probe:
  - mobility_stats: reduce a (ntraj, B) topological-charge series to
    mobility per trajectory with a chain-bootstrap error bar (the same
    chain-independence argument as observables.chain_stats) and the
    tunneling-event count the BENCH statistics floors gate on;
  - mobility_probe: a short timed FT-HMC / HMC burst (quenched or
    two-flavor Schwinger) returning B*mob/s +- err, so training loops and
    fine-tune harnesses can SELECT on mobility in-loop (minutes, not
    hours).

Reference anchor: the mobility statistic is the reference prototype's own
diagnostic (reference ipynb/ft_hmc.py:52-53,168-176 tracks dQ^2 between
consecutive configurations); the reference never wires it into training
or selection. No reference counterpart for the probe itself.
"""
from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mobility_stats", "mobility_probe"]


def mobility_stats(q: np.ndarray, *, s_per_traj: float | None = None,
                   n_boot: int = 400, seed: int = 0) -> dict[str, Any]:
    """Mobility summary of a (ntraj, n_chains) topological-charge series.

    mobility = mean |Q_{t+1} - Q_t|^2 per trajectory (the BENCH q_mobility
    statistic). Error bar: bootstrap over the chain axis of the per-chain
    means (chains are independent). n_events uses the exact transition
    count (ntraj-1 per chain). If s_per_traj is given, adds the wall-clock
    verdict metric B_mob_per_s = mobility * n_chains / s_per_traj.
    """
    q = np.asarray(q, dtype=np.float64)
    if q.ndim == 1:
        q = q[:, None]
    dq2 = np.abs(np.diff(q, axis=0)) ** 2          # (ntraj-1, B)
    if dq2.shape[0] == 0:
        raise ValueError("need >= 2 trajectories for a mobility estimate")
    per_chain = dq2.mean(axis=0)                   # (B,)
    mob = float(per_chain.mean())
    nchain = per_chain.shape[0]
    if nchain > 1:
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, nchain, size=(n_boot, nchain))
        err = float(per_chain[idx].mean(axis=1).std(ddof=1))
    else:  # single chain: Poisson-count fallback
        nev = max(dq2.sum(), 1.0)
        err = mob / float(np.sqrt(nev))
    out = {
        "mobility": mob,
        "mobility_err": err,
        "n_events": float(dq2.sum()),
        "n_chains": nchain,
        "ntraj": int(q.shape[0]),
    }
    if s_per_traj is not None:
        out["s_per_traj"] = float(s_per_traj)
        out["B_mob_per_s"] = mob * nchain / s_per_traj
        out["B_mob_per_s_err"] = err * nchain / s_per_traj
    return out


def _sync(x) -> float:
    # device reduction + host transfer: the only reliable fence through
    # the axon tunnel (block_until_ready returns early there — CLAUDE.md)
    return float(jnp.sum(x))


def mobility_probe(params, spec, *, L: int, beta: float,
                   mass: float = 0.0, n_chains: int = 128,
                   ntraj: int = 768, therm: int = 256, tau: float = 0.5,
                   nstep: int = 4, key=None, call_block: int = 256,
                   cg_maxiter: int = 1500, sampler: str = "ft",
                   min_events: float = 0.0,
                   max_extra_blocks: int = 0) -> dict[str, Any]:
    """Fixed-budget timed mobility burst for a flow candidate.

    sampler='ft' runs FT-HMC with (params, spec); sampler='plain' ignores
    the flow and runs plain HMC (baseline row). mass > 0 runs the
    two-flavor Schwinger samplers (the production selection regime:
    16^2 beta=6 m=0.1, where round 4's fermaware-vs-ftb6 verdict was
    measured); mass == 0 runs quenched.

    Cold start (ft: f^-1(unit links) latents; plain: unit links), >=
    `therm` untimed trajectories (run in timed-shape blocks, doubling as
    the jit warmup so compile time never leaks into s_per_traj), then
    `ntraj` timed ones — rounded up to whole blocks of min(call_block,
    ntraj) trajectories so every timed execution reuses one compiled
    program (the axon worker dies under long single executions; CLAUDE.md
    call-block limits apply). If min_events > 0
    the timed segment extends by up to max_extra_blocks more call-blocks
    until the tunneling-event floor is met (rows below it are flagged
    valid=False — the BENCH statistics-floor protocol).

    Returns mobility_stats(...) plus acc/plaq and valid.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    if sampler not in ("ft", "plain"):
        raise ValueError(f"unknown sampler {sampler!r}")

    if mass > 0.0:
        from fthmc_tpu.schwinger import (SchwingerConfig,
                                         _run_fthmc_dyn_scan,
                                         _run_hmc_dyn_scan)
        cfg = SchwingerConfig(L=L, beta=beta, mass=mass, tau=tau,
                              nstep=nstep, n_chains=n_chains, ntraj=0,
                              cg_maxiter=cg_maxiter)
        if sampler == "ft":
            def run(k, z, n):
                return _run_fthmc_dyn_scan(params, spec, k, z, cfg, n)
        else:
            def run(k, z, n):
                return _run_hmc_dyn_scan(k, z, cfg, n)
    else:
        from fthmc_tpu.hmc import _run_fthmc_scan, _run_hmc_scan
        dt = tau / nstep
        if sampler == "ft":
            def run(k, z, n):
                return _run_fthmc_scan(params, spec, k, z, beta, dt,
                                       nstep, n, "auto",
                                       integrator="omelyan")
        else:
            def run(k, z, n):
                return _run_hmc_scan(k, z, beta, dt, nstep, n,
                                     integrator="omelyan")

    if sampler == "ft":
        from fthmc_tpu.models.flow import flow_reverse
        z = flow_reverse(params, jnp.zeros((n_chains, 2, L, L),
                                           jnp.float32), spec)[0]
    else:
        z = jnp.zeros((n_chains, 2, L, L), jnp.float32)

    # every timed execution uses the SAME block size (one compiled
    # program): jit-compile time must never leak into s_per_traj, or an
    # in-loop selector would systematically punish the first candidate
    # probed. ntraj rounds UP to a whole number of blocks.
    block = min(call_block, ntraj)
    n_blocks = -(-ntraj // block)
    ntraj = n_blocks * block

    def advance(z, n_blk, blk, k, collect, timed):
        hs, wall = [], 0.0
        for _ in range(n_blk):
            k, kb = jax.random.split(k)
            t0 = time.time()
            z, h = run(kb, z, blk)
            _sync(z)                       # fence inside the timed region
            if timed:
                wall += time.time() - t0
            if collect:
                hs.append(h)
        return z, hs, wall, k

    # therm in timed-shape blocks (acts as the compile warmup too)
    th_blocks = max(-(-therm // block), 1)
    z, _, _, key = advance(z, th_blocks, block,
                           jax.random.fold_in(key, 1),
                           collect=False, timed=False)
    z, hs, wall, key = advance(z, n_blocks, block,
                               jax.random.fold_in(key, 2),
                               collect=True, timed=True)

    def _reduce(hs, wall, n):
        qs = np.concatenate([np.asarray(h.q) for h in hs])
        st = mobility_stats(qs, s_per_traj=wall / n)
        st["acc"] = float(np.concatenate(
            [np.asarray(h.acc) for h in hs]).mean())
        st["plaq"] = float(np.concatenate(
            [np.asarray(h.plaq) for h in hs]).mean())
        return st

    n_timed = ntraj
    st = _reduce(hs, wall, n_timed)
    extra = 0
    while (min_events > 0 and st["n_events"] < min_events
           and extra < max_extra_blocks):
        z, hs2, w2, key = advance(z, 1, block, key, collect=True,
                                  timed=True)
        hs.extend(hs2)
        wall += w2
        n_timed += block
        extra += 1
        st = _reduce(hs, wall, n_timed)
    st["valid"] = bool(min_events <= 0 or st["n_events"] >= min_events)
    st["beta"], st["mass"], st["L"] = float(beta), float(mass), int(L)
    st["tau"], st["nstep"], st["sampler"] = float(tau), int(nstep), sampler
    return st
