"""Two-flavor Schwinger model samplers: plain HMC and FT-HMC with dynamical
Wilson fermions (pseudofermions + CG force solves).

BEYOND-REFERENCE capability (nftqcd/fthmc is pure-gauge): this is the
expensive-force regime where field-transformed HMC pays off in WALL-CLOCK,
not just per-trajectory decorrelation — every force evaluation costs a
Krylov solve (O(100) Dirac applications), so the flow VJP overhead that
dominates the pure-gauge cost ladder (BENCH.md round 3) is amortized and the
measured tau_int(Q) ratio converts to a wall-clock win.

Algorithm (exact, standard 2-flavor pseudofermion HMC):
  1. trajectory start: v ~ N(0,1); pseudofermion heatbath phi = D^dag chi,
     chi ~ CN(0,1)  (S_pf at the start is chi^dag chi EXACTLY — no solve);
  2. integrate dx/dt = v, dv/dt = -dS/dx with
     S = S_gauge + phi^dag (D^dag D)^{-1} phi; the fermion force uses the
     gradient-exact variational form (fermion.pf_action_lin) around a CG
     solve at tolerance cfg.cg_tol_force, warm-started from the previous
     step's solution when cfg.warm_start (a chronological inverter);
  3. Metropolis with dH = dK + dS_gauge + [S_pf(x1) - chi^dag chi], the end
     S_pf from a CG solve at the TIGHT tolerance cfg.cg_tol_mh (1e-9 vs the
     force's 1e-7). With cfg.warm_start this accept solve is ALSO seeded
     from the trajectory's last force solution — a detailed-balance
     asymmetry bounded by cg_tol_mh, measured statistically invisible
     (cold-solve A/B at the production point: identical acc/plaq/dH within
     errors, BENCH.md round-3 "warm-start reversibility exonerated").
     Strict detailed balance: cfg.warm_start=False (CLI --no-warm-start)
     makes every solve cold, at ~10-20%% trajectory cost.

The FT versions run the SAME dynamics in latent space z with
S_eff(z) = S(T(z)) - log|det dT/dz|; the fermion force backpropagates
through the flow via ONE VJP (the CG solve itself is never differentiated).

Design notes (TPU): fields stay (B, 2, L, L) fp32 / (B, L, L, 2) complex64;
the whole run is one jitted lax.scan; CG is a lax.while_loop inside the
scan (dynamic trip count is fine under jit); per-chain Metropolis is
branchless jnp.where.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fthmc_tpu import fermion, lattice
from fthmc_tpu.config import FlowSpec
from fthmc_tpu.hmc import TrajMetrics, _kinetic_delta, resolve_remat
from fthmc_tpu.models.flow import flow_forward

__all__ = ["SchwingerConfig", "dyn_force", "hmc_step_dyn", "run_hmc_dyn",
           "run_hmc_dyn_chunked", "ft_dyn_force", "fthmc_step_dyn",
           "run_fthmc_dyn", "run_fthmc_dyn_chunked", "gauge_drift",
           "nested_leapfrog_aux", "nested_omelyan_aux",
           "nested_omelyan_3level", "hb_step_dyn", "ft_gauge_force",
           "ft_fermion_force"]


@dataclasses.dataclass(frozen=True)
class SchwingerConfig:
    """Dynamical-fermion run parameters (hashable: usable as a jit static)."""
    L: int = 16
    beta: float = 4.0
    mass: float = 0.1
    tau: float = 1.0
    nstep: int = 20
    n_chains: int = 64
    ntraj: int = 256
    integrator: str = "omelyan"
    cg_tol_force: float = 1e-9   # on |r|^2/|b|^2 (rel residual = sqrt)
    cg_tol_mh: float = 1e-12     # Metropolis solve: algorithm exactness
    cg_maxiter: int = 1000
    warm_start: bool = True      # chronological inverter for FORCE solves
    # even-odd Schur-preconditioned solves: same det(D)^2 theory (constant
    # det A_oo), measured 2.5x fewer CG iterations at 16^2 beta=5 m=0.1
    eo_precond: bool = True
    # Multi-timescale (Sexton-Weingarten) integration: if n_inner > 0,
    # `nstep` counts OUTER steps (fermion kicks, one CG solve each; fused
    # half-kicks -> nstep+1 solves per trajectory) and each outer step
    # drifts through n_inner Omelyan sub-steps of gauge(-flow)-only
    # dynamics. The fermion force is smooth (plain HMC runs at dt=1/4);
    # the gauge/flow-VJP force is cheap but rugged - splitting the scales
    # removes CG solves from the fine scale. `integrator` selects the
    # OUTER scheme: 'omelyan' (2 solves/outer step, ~6x smaller error -
    # required for FT, where the flow Jacobian roughens the fermion force
    # in latent space) or 'leapfrog' (fused kicks, nstep+1 solves).
    n_inner: int = 0
    # Hasenbusch mass preconditioning (fermion.hasenbusch_refresh): if
    # dm > 0 the determinant splits at m1 = mass + dm into a HEAVY term
    # (cheap solves) and a RATIO term (light solves, O(dm)-small force),
    # integrated on a 3-level nested Omelyan schedule:
    #   nstep   = outer steps (ratio kicks, 2 light solves each),
    #   n_mid   = heavy steps per outer drift segment (cheap solves),
    #   n_inner = gauge steps per heavy drift segment (no solves).
    # Requires n_inner >= 1. The payoff regime is light masses, where
    # light solves dominate and the ratio force's small magnitude lets
    # the outer scale stay coarse.
    hasenbusch_dm: float = 0.0
    n_mid: int = 1

    @property
    def dt(self) -> float:
        return self.tau / self.nstep


# ---------------------------------------------------------------- plain HMC

def dyn_force(x: jnp.ndarray, phi: jnp.ndarray, beta: float, mass: float,
              x_guess: jnp.ndarray, tol: float, maxiter: int,
              eo: bool = False):
    """Total force dS/dx = gauge sin-stencil + fermion force; returns
    (force, cg_solution) so callers can warm-start the next solve."""
    res = fermion.cg_solve(x, phi, mass, x_guess, tol=tol, maxiter=maxiter,
                           eo=eo)

    def s_f(th):
        return jnp.sum(fermion.pf_action_lin(th, phi, res.x, mass, eo=eo))

    fg = jax.vmap(lambda c: lattice.force(c, beta))(x) if x.ndim == 4 \
        else lattice.force(x, beta)
    return fg + jax.grad(s_f)(x), res.x


def leapfrog_aux(x, v, dt: float, nstep: int, force_fn, aux):
    """Position-Verlet leapfrog; force_fn(x, aux) -> (force, aux)."""
    def body(carry, _):
        x, v, aux = carry
        x_half = x + 0.5 * dt * v
        f, aux = force_fn(x_half, aux)
        v_new = v - dt * f
        x_new = x_half + 0.5 * dt * v_new
        return (x_new, v_new, aux), None

    (x, v, aux), _ = jax.lax.scan(body, (x, v, aux), None, length=nstep)
    return x, v, aux


_OMELYAN_LAMBDA = 0.1931833275037836


def gauge_drift(x, v, span: float, n_in: int, force_g):
    """Integrate the GAUGE(-flow)-only dynamics (x, v) for time `span` with
    n_in Omelyan 2MN steps; force_g(x) -> f has no auxiliary state (no CG).
    Symplectic + time-reversible, so it is a valid drift substitute in a
    Sexton-Weingarten nesting (hep-lat/9209003)."""
    lam = _OMELYAN_LAMBDA
    dt = span / n_in

    def body(carry, _):
        x, v = carry
        x = x + lam * dt * v
        v = v - 0.5 * dt * force_g(x)
        x = x + (1.0 - 2.0 * lam) * dt * v
        v = v - 0.5 * dt * force_g(x)
        x = x + lam * dt * v
        return (x, v), None

    (x, v), _ = jax.lax.scan(body, (x, v), None, length=n_in)
    return x, v


def nested_leapfrog_aux(x, v, dt: float, nstep: int, n_in: int,
                        force_f, force_g, aux):
    """Multi-timescale integrator: outer leapfrog on the FERMION force
    (force_f(x, aux) -> (f, aux), one CG solve per evaluation; adjacent
    half-kicks fused -> nstep+1 evaluations) around inner Omelyan
    gauge-only drifts (force_g, 2*n_in evaluations per outer step).

    Reversible and volume-preserving: a symmetric composition of symplectic
    maps; Metropolis exactness is untouched."""
    f, aux = force_f(x, aux)
    v = v - 0.5 * dt * f

    def body(carry, _):
        x, v, aux = carry
        x, v = gauge_drift(x, v, dt, n_in, force_g)
        f, aux = force_f(x, aux)
        return (x, v - dt * f, aux), None

    (x, v, aux), _ = jax.lax.scan(body, (x, v, aux), None, length=nstep - 1)
    x, v = gauge_drift(x, v, dt, n_in, force_g)
    f, aux = force_f(x, aux)
    return x, v - 0.5 * dt * f, aux


def nested_omelyan_aux(x, v, dt: float, nstep: int, n_in: int,
                       force_f, force_g, aux):
    """Multi-timescale integrator with Omelyan 2MN at the OUTER (fermion)
    level too: ~6x smaller outer error coefficient than nested leapfrog at
    2 solves/outer step — measured necessary for FT-HMC, where the flow
    Jacobian makes even the smooth fermion force rugged in latent space.

    Each outer drift segment (spans lam*dt / (1-2lam)*dt / lam*dt) is
    integrated by inner gauge-only Omelyan sub-steps, allocated
    proportionally to the span (total ~= 2*n_in fine steps per outer
    step). Symmetric composition of symplectic maps: reversible, exact
    under Metropolis."""
    lam = _OMELYAN_LAMBDA
    n_edge = max(1, round(n_in * lam * 2.0))          # lam*dt segment
    n_mid = max(1, 2 * n_in - 2 * n_edge)             # (1-2lam)*dt segment

    def body(carry, _):
        x, v, aux = carry
        x, v = gauge_drift(x, v, lam * dt, n_edge, force_g)
        f, aux = force_f(x, aux)
        v = v - 0.5 * dt * f
        x, v = gauge_drift(x, v, (1.0 - 2.0 * lam) * dt, n_mid, force_g)
        f, aux = force_f(x, aux)
        v = v - 0.5 * dt * f
        x, v = gauge_drift(x, v, lam * dt, n_edge, force_g)
        return (x, v, aux), None

    (x, v, aux), _ = jax.lax.scan(body, (x, v, aux), None, length=nstep)
    return x, v, aux


def omelyan_aux(x, v, dt: float, nstep: int, force_fn, aux):
    """2MN Omelyan (same lambda as hmc.omelyan); force_fn(x, aux)->(f, aux).
    Two force evaluations per step, O(dt^2) error with a ~1/6 smaller
    coefficient than leapfrog."""
    lam = 0.1931833275037836

    def body(carry, _):
        x, v, aux = carry
        x = x + lam * dt * v
        f, aux = force_fn(x, aux)
        v = v - 0.5 * dt * f
        x = x + (1.0 - 2.0 * lam) * dt * v
        f, aux = force_fn(x, aux)
        v = v - 0.5 * dt * f
        x = x + lam * dt * v
        return (x, v, aux), None

    (x, v, aux), _ = jax.lax.scan(body, (x, v, aux), None, length=nstep)
    return x, v, aux


def nested_omelyan_3level(x, v, dt: float, nstep: int, n_mid: int,
                          n_in: int, force_outer, force_mid, force_g, aux):
    """Three-timescale nested Omelyan: outer kicks from force_outer
    (ratio term — light solves), each outer drift segment integrated by
    n_mid Omelyan steps of force_mid (heavy term — cheap solves), each
    mid drift segment by n_in gauge-only Omelyan steps (no solves).
    force_outer/force_mid: (x, aux) -> (f, aux); aux is shared (e.g. a
    tuple of warm-start slots — each force reads/writes its own).
    Symmetric composition of symplectic maps: reversible + exact."""
    lam = _OMELYAN_LAMBDA

    def mid_drift(x, v, span, aux):
        mdt = span / n_mid

        def mbody(carry, _):
            x, v, aux = carry
            x, v = gauge_drift(x, v, lam * mdt, n_in, force_g)
            f, aux = force_mid(x, aux)
            v = v - 0.5 * mdt * f
            x, v = gauge_drift(x, v, (1.0 - 2.0 * lam) * mdt, n_in,
                               force_g)
            f, aux = force_mid(x, aux)
            v = v - 0.5 * mdt * f
            x, v = gauge_drift(x, v, lam * mdt, n_in, force_g)
            return (x, v, aux), None

        (x, v, aux), _ = jax.lax.scan(mbody, (x, v, aux), None,
                                      length=n_mid)
        return x, v, aux

    def body(carry, _):
        x, v, aux = carry
        x, v, aux = mid_drift(x, v, lam * dt, aux)
        f, aux = force_outer(x, aux)
        v = v - 0.5 * dt * f
        x, v, aux = mid_drift(x, v, (1.0 - 2.0 * lam) * dt, aux)
        f, aux = force_outer(x, aux)
        v = v - 0.5 * dt * f
        x, v, aux = mid_drift(x, v, lam * dt, aux)
        return (x, v, aux), None

    (x, v, aux), _ = jax.lax.scan(body, (x, v, aux), None, length=nstep)
    return x, v, aux


def hb_step_dyn(key: jax.Array, x: jnp.ndarray, q_old: jnp.ndarray,
                cfg: SchwingerConfig):
    """One batched Hasenbusch-preconditioned dynamical-HMC trajectory:
    det(D^dag D) split at m1 = mass + hasenbusch_dm (fermion.py), 3-level
    nested Omelyan (ratio / heavy / gauge). x: (B, 2, L, L)."""
    m1 = cfg.mass + cfg.hasenbusch_dm
    kv, kp, ka = jax.random.split(key, 3)
    v0 = jax.random.normal(kv, x.shape, x.dtype)
    phi1, phi2, s_f0 = fermion.hasenbusch_refresh(
        kp, x, cfg.mass, m1, tol=cfg.cg_tol_mh, maxiter=cfg.cg_maxiter,
        eo=cfg.eo_precond)

    def heavy_force(xx, aux):
        x1g, yg = aux
        guess = x1g if cfg.warm_start else jnp.zeros_like(phi1)
        res = fermion.cg_solve(xx, phi1, m1, guess, tol=cfg.cg_tol_force,
                               maxiter=cfg.cg_maxiter, eo=cfg.eo_precond)

        def s1(th):
            return jnp.sum(fermion.pf_action_lin(th, phi1, res.x, m1,
                                                 eo=cfg.eo_precond))

        return jax.grad(s1)(xx), (res.x, yg)

    def ratio_force(xx, aux):
        x1g, yg = aux
        guess = yg if cfg.warm_start else jnp.zeros_like(phi2)
        b = (fermion.dirac_hat_dag if cfg.eo_precond
             else fermion.dirac_dag)(xx, phi2, m1)
        res = fermion.cg_solve(xx, b, cfg.mass, guess,
                               tol=cfg.cg_tol_force,
                               maxiter=cfg.cg_maxiter, eo=cfg.eo_precond)

        def s2(th):
            return jnp.sum(fermion.ratio_action_lin(th, phi2, res.x,
                                                    cfg.mass, m1,
                                                    eo=cfg.eo_precond))

        return jax.grad(s2)(xx), (x1g, res.x)

    def gauge_force(xx):
        return (jax.vmap(lambda c: lattice.force(c, cfg.beta))(xx)
                if xx.ndim == 4 else lattice.force(xx, cfg.beta))

    aux0 = (jnp.zeros_like(phi1), jnp.zeros_like(phi2))
    x1, v1, aux = nested_omelyan_3level(
        x, v0, cfg.dt, cfg.nstep, cfg.n_mid, max(cfg.n_inner, 1),
        ratio_force, heavy_force, gauge_force, aux0)
    x1 = lattice.wrap(x1)

    s1_end, _ = fermion.pf_action_exact(
        x1, phi1, m1, tol=cfg.cg_tol_mh, maxiter=cfg.cg_maxiter,
        x0=aux[0] if cfg.warm_start else None, eo=cfg.eo_precond)
    s2_end, _ = fermion.ratio_action_exact(
        x1, phi2, cfg.mass, m1, tol=cfg.cg_tol_mh, maxiter=cfg.cg_maxiter,
        x0=aux[1] if cfg.warm_start else None, eo=cfg.eo_precond)
    dsg = jax.vmap(lambda a, b: lattice.delta_action(a, b, cfg.beta))(x1, x)
    dh = dsg + (s1_end + s2_end - s_f0) + _kinetic_delta(v1, v0)
    exp_mdh = jnp.exp(-dh)
    acc = jax.random.uniform(ka, dh.shape, dh.dtype) < exp_mdh

    accb = acc[:, None, None, None]
    x_new = jnp.where(accb, x1, x)
    q_new = lattice.batch_charges(x_new)
    metrics = TrajMetrics(
        dh=dh, exp_mdh=exp_mdh, acc=acc.astype(x.dtype),
        plaq=lattice.batch_plaq_mean(x_new), q=q_new,
        dq=jnp.abs(q_new - q_old))
    return x_new, q_new, metrics


def hmc_step_dyn(key: jax.Array, x: jnp.ndarray, q_old: jnp.ndarray,
                 cfg: SchwingerConfig):
    """One batched dynamical-fermion HMC trajectory. x: (B, 2, L, L)."""
    kv, kp, ka = jax.random.split(key, 3)
    v0 = jax.random.normal(kv, x.shape, x.dtype)
    phi, s_pf0 = fermion.pf_refresh(kp, x, cfg.mass, eo=cfg.eo_precond)

    if cfg.n_inner > 0:
        def fermion_force(xx, x_guess):
            guess = x_guess if cfg.warm_start else jnp.zeros_like(phi)
            res = fermion.cg_solve(xx, phi, cfg.mass, guess,
                                   tol=cfg.cg_tol_force,
                                   maxiter=cfg.cg_maxiter,
                                   eo=cfg.eo_precond)

            def s_f(th):
                return jnp.sum(fermion.pf_action_lin(th, phi, res.x,
                                                     cfg.mass,
                                                     eo=cfg.eo_precond))

            return jax.grad(s_f)(xx), res.x

        def gauge_force(xx):
            return (jax.vmap(lambda c: lattice.force(c, cfg.beta))(xx)
                    if xx.ndim == 4 else lattice.force(xx, cfg.beta))

        nested = (nested_omelyan_aux if cfg.integrator == "omelyan"
                  else nested_leapfrog_aux)
        x1, v1, x_sol = nested(
            x, v0, cfg.dt, cfg.nstep, cfg.n_inner, fermion_force,
            gauge_force, jnp.zeros_like(phi))
    else:
        def force_fn(xx, x_guess):
            guess = x_guess if cfg.warm_start else jnp.zeros_like(phi)
            return dyn_force(xx, phi, cfg.beta, cfg.mass, guess,
                             cfg.cg_tol_force, cfg.cg_maxiter,
                             eo=cfg.eo_precond)

        integ = omelyan_aux if cfg.integrator == "omelyan" else leapfrog_aux
        x1, v1, x_sol = integ(x, v0, cfg.dt, cfg.nstep, force_fn,
                              jnp.zeros_like(phi))
    x1 = lattice.wrap(x1)

    s_pf1, _ = fermion.pf_action_exact(x1, phi, cfg.mass, tol=cfg.cg_tol_mh,
                                       maxiter=cfg.cg_maxiter,
                                       x0=x_sol if cfg.warm_start else None,
                                       eo=cfg.eo_precond)
    dsg = jax.vmap(lambda a, b: lattice.delta_action(a, b, cfg.beta))(x1, x)
    dh = dsg + (s_pf1 - s_pf0) + _kinetic_delta(v1, v0)
    exp_mdh = jnp.exp(-dh)
    acc = jax.random.uniform(ka, dh.shape, dh.dtype) < exp_mdh

    accb = acc[:, None, None, None]
    x_new = jnp.where(accb, x1, x)
    q_new = lattice.batch_charges(x_new)
    metrics = TrajMetrics(
        dh=dh, exp_mdh=exp_mdh, acc=acc.astype(x.dtype),
        plaq=lattice.batch_plaq_mean(x_new), q=q_new,
        dq=jnp.abs(q_new - q_old))
    return x_new, q_new, metrics


@partial(jax.jit, static_argnames=("cfg", "ntraj"))
def _run_hmc_dyn_scan(key, x0, cfg: SchwingerConfig, ntraj: int):
    q0 = lattice.batch_charges(x0)
    step = hb_step_dyn if cfg.hasenbusch_dm > 0 else hmc_step_dyn

    def body(carry, key):
        x, q = carry
        x, q, m = step(key, x, q, cfg)
        return (x, q), m

    keys = jax.random.split(key, ntraj)
    (x, _), hist = jax.lax.scan(body, (x0, q0), keys)
    return x, hist


def run_hmc_dyn(cfg: SchwingerConfig, x0: jnp.ndarray | None = None,
                key: jax.Array | None = None):
    """Whole dynamical-HMC run as one jitted scan. Returns (x, TrajMetrics)
    with per-trajectory (ntraj, B) histories."""
    key = jax.random.PRNGKey(0) if key is None else key
    if x0 is None:
        x0 = lattice.hot_start(jax.random.fold_in(key, 7), cfg.n_chains,
                               cfg.L)
    return _run_hmc_dyn_scan(key, x0, cfg, cfg.ntraj)


def run_hmc_dyn_chunked(cfg: SchwingerConfig, *, block: int = 256,
                        x0: jnp.ndarray | None = None,
                        key: jax.Array | None = None):
    """Blocked driver (device executions stay short; see ROADMAP infra
    notes). Returns (x, TrajMetrics) concatenated over blocks."""
    from fthmc_tpu.hmc import _concat_metrics
    key = jax.random.PRNGKey(0) if key is None else key
    if x0 is None:
        x0 = lattice.hot_start(jax.random.fold_in(key, 7), cfg.n_chains,
                               cfg.L)
    x, out, left = x0, [], cfg.ntraj
    # the compiled scans never read cfg.ntraj (the block length n is an
    # explicit static arg); normalize it so runs with different totals
    # share one compile cache entry per block size
    cfg = dataclasses.replace(cfg, ntraj=0)
    while left > 0:
        n = min(block, left)
        key, krun = jax.random.split(key)
        x, h = _run_hmc_dyn_scan(krun, x, cfg, n)
        jax.block_until_ready(x)
        out.append(h)
        left -= n
    return x, _concat_metrics(out)


# ------------------------------------------------------------------ FT-HMC

def ft_dyn_force(params, spec: FlowSpec, z: jnp.ndarray, cfg,
                 phi: jnp.ndarray, x_guess: jnp.ndarray, remat: bool):
    """dS_eff/dz for the dynamical theory: ONE flow VJP carries both the
    gauge stencil force and the fermion force back to latent space; the CG
    solve runs on the (stop-gradient) physical field and is never
    differentiated. Returns (force_z, cg_solution)."""
    (x, logj), vjp = jax.vjp(
        lambda zz: flow_forward(params, zz, spec, remat=remat), z)
    res = fermion.cg_solve(jax.lax.stop_gradient(x), phi, cfg.mass, x_guess,
                           tol=cfg.cg_tol_force, maxiter=cfg.cg_maxiter,
                           eo=cfg.eo_precond)

    def s_x(xx):
        sg = lattice.batch_action(xx, cfg.beta)
        sf = fermion.pf_action_lin(xx, phi, res.x, cfg.mass,
                                   eo=cfg.eo_precond)
        return jnp.sum(sg + sf)

    gx = jax.grad(s_x)(x)
    gz, = vjp((gx, -jnp.ones_like(logj)))
    return gz, res.x


def ft_gauge_force(params, spec: FlowSpec, z: jnp.ndarray, beta: float,
                   remat: bool) -> jnp.ndarray:
    """Latent-space force of the GAUGE part of S_eff only:
    d/dz [S_gauge(T(z)) - log|det dT/dz|] — one flow VJP, no CG. This is
    the rugged-but-cheap force that sets the fine timescale in the
    multi-timescale splitting."""
    def s(zz):
        x, logj = flow_forward(params, zz, spec, remat=remat)
        return jnp.sum(lattice.batch_action(x, beta) - logj)

    return jax.grad(s)(z)


def ft_fermion_force(params, spec: FlowSpec, z: jnp.ndarray, cfg,
                     phi: jnp.ndarray, x_guess: jnp.ndarray, remat: bool):
    """Latent-space force of the PSEUDOFERMION part of S_eff only: the CG
    solve runs on the stop-gradient physical field, its variational-form
    gradient is pulled back through the flow by one VJP (logdet cotangent
    zero — the logdet force lives on the fine scale with the gauge part).
    Returns (force_z, cg_solution)."""
    (x, logj), vjp = jax.vjp(
        lambda zz: flow_forward(params, zz, spec, remat=remat), z)
    res = fermion.cg_solve(jax.lax.stop_gradient(x), phi, cfg.mass, x_guess,
                           tol=cfg.cg_tol_force, maxiter=cfg.cg_maxiter,
                           eo=cfg.eo_precond)

    def s_x(xx):
        return jnp.sum(fermion.pf_action_lin(xx, phi, res.x, cfg.mass,
                                             eo=cfg.eo_precond))

    gx = jax.grad(s_x)(x)
    gz, = vjp((gx, jnp.zeros_like(logj)))
    return gz, res.x


def fthmc_step_dyn(params, spec: FlowSpec, key: jax.Array, z: jnp.ndarray,
                   q_old: jnp.ndarray, cfg: SchwingerConfig, remat="auto"):
    """One batched dynamical-fermion FT-HMC trajectory in latent space.

    The pseudofermion heatbath happens on the PHYSICAL field x = T(z) (phi
    lives in physical space; the flow only reshapes the gauge measure)."""
    if cfg.hasenbusch_dm > 0:
        raise ValueError("hasenbusch_dm is implemented for plain dynamical "
                         "HMC only (hb_step_dyn); unset it for FT-HMC")
    remat = resolve_remat(remat, z.shape)
    kv, kp, ka = jax.random.split(key, 3)
    v0 = jax.random.normal(kv, z.shape, z.dtype)

    y0, logdet0 = flow_forward(params, z, spec, remat=remat)
    phi, s_pf0 = fermion.pf_refresh(kp, y0, cfg.mass, eo=cfg.eo_precond)

    if cfg.n_inner > 0:
        def fermion_fn(zz, x_guess):
            guess = x_guess if cfg.warm_start else jnp.zeros_like(phi)
            return ft_fermion_force(params, spec, zz, cfg, phi, guess,
                                    remat)

        def gauge_fn(zz):
            return ft_gauge_force(params, spec, zz, cfg.beta, remat)

        nested = (nested_omelyan_aux if cfg.integrator == "omelyan"
                  else nested_leapfrog_aux)
        z1, v1, x_sol = nested(
            z, v0, cfg.dt, cfg.nstep, cfg.n_inner, fermion_fn, gauge_fn,
            jnp.zeros_like(phi))
    else:
        def force_fn(zz, x_guess):
            guess = x_guess if cfg.warm_start else jnp.zeros_like(phi)
            return ft_dyn_force(params, spec, zz, cfg, phi, guess, remat)

        integ = omelyan_aux if cfg.integrator == "omelyan" else leapfrog_aux
        z1, v1, x_sol = integ(z, v0, cfg.dt, cfg.nstep, force_fn,
                              jnp.zeros_like(phi))
    z1 = lattice.wrap(z1)
    y1, logdet1 = flow_forward(params, z1, spec, remat=remat)

    s_pf1, _ = fermion.pf_action_exact(y1, phi, cfg.mass, tol=cfg.cg_tol_mh,
                                       maxiter=cfg.cg_maxiter,
                                       x0=x_sol if cfg.warm_start else None,
                                       eo=cfg.eo_precond)
    dsw = -cfg.beta * jnp.sum(
        (jnp.cos(lattice.batch_plaqs(y1)) - jnp.cos(lattice.batch_plaqs(y0))
         ).reshape(z.shape[0], -1), axis=-1)
    dh = (dsw + (s_pf1 - s_pf0) - (logdet1 - logdet0)
          + _kinetic_delta(v1, v0))
    exp_mdh = jnp.exp(-dh)
    acc = jax.random.uniform(ka, dh.shape, dh.dtype) < exp_mdh

    accb = acc[:, None, None, None]
    z_new = jnp.where(accb, z1, z)
    y_new = jnp.where(accb, y1, y0)
    q_new = lattice.batch_charges(y_new)
    metrics = TrajMetrics(
        dh=dh, exp_mdh=exp_mdh, acc=acc.astype(z.dtype),
        plaq=lattice.batch_plaq_mean(y_new), q=q_new,
        dq=jnp.abs(q_new - q_old))
    return z_new, y_new, q_new, metrics


@partial(jax.jit, static_argnames=("spec", "cfg", "ntraj", "remat"))
def _run_fthmc_dyn_scan(params, spec, key, z0, cfg: SchwingerConfig,
                        ntraj: int, remat="auto"):
    remat = resolve_remat(remat, z0.shape)
    y0, _ = flow_forward(params, z0, spec, remat=remat)
    q0 = lattice.batch_charges(y0)

    def body(carry, key):
        z, q = carry
        z, _, q, m = fthmc_step_dyn(params, spec, key, z, q, cfg,
                                    remat=remat)
        return (z, q), m

    keys = jax.random.split(key, ntraj)
    (z, _), hist = jax.lax.scan(body, (z0, q0), keys)
    return z, hist


def run_fthmc_dyn(params, spec: FlowSpec, cfg: SchwingerConfig, *,
                  z0: jnp.ndarray | None = None,
                  key: jax.Array | None = None, remat="auto"):
    """Whole dynamical FT-HMC run as one jitted scan (latent chain state)."""
    key = jax.random.PRNGKey(0) if key is None else key
    if z0 is None:
        z0 = lattice.hot_start(jax.random.fold_in(key, 7), cfg.n_chains,
                               cfg.L)
    return _run_fthmc_dyn_scan(params, spec, key, z0, cfg, cfg.ntraj,
                               remat=remat)


def run_fthmc_dyn_chunked(params, spec: FlowSpec, cfg: SchwingerConfig, *,
                          block: int = 128, z0: jnp.ndarray | None = None,
                          key: jax.Array | None = None, remat="auto"):
    from fthmc_tpu.hmc import _concat_metrics
    key = jax.random.PRNGKey(0) if key is None else key
    if z0 is None:
        z0 = lattice.hot_start(jax.random.fold_in(key, 7), cfg.n_chains,
                               cfg.L)
    z, out, left = z0, [], cfg.ntraj
    # see run_hmc_dyn_chunked: cfg.ntraj is dead inside the compiled scan
    cfg = dataclasses.replace(cfg, ntraj=0)
    while left > 0:
        n = min(block, left)
        key, krun = jax.random.split(key)
        z, h = _run_fthmc_dyn_scan(params, spec, krun, z, cfg, n,
                                   remat=remat)
        jax.block_until_ready(z)
        out.append(h)
        left -= n
    return z, _concat_metrics(out)
