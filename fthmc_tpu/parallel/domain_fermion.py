"""Domain-decomposed dynamical Wilson fermions: row-sharded Dirac operator,
conjugate-gradient solver, and the full two-flavor Schwinger-model HMC step.

Extends parallel/domain.py (row-sharded pure-gauge HMC) and
parallel/domain_flow.py (row-sharded flow) to the fermion sector, so
dynamical-fermion lattices beyond one chip's HBM run over a device mesh.
No reference counterpart (the reference is pure-gauge and single-device;
SURVEY.md section 2b "seq/context analogue").

Design (all functions run INSIDE jax.shard_map; fields are row-sharded:
gauge theta (B, 2, L0/n, L1), spinors psi (B, L0/n, L1, 2) complex):

- The Wilson hop is nearest-neighbor, so each application exchanges ONE
  halo row per direction via jax.lax.ppermute (ICI neighbor pattern) —
  complex planes travel as (re, im) pairs to stay clear of complex
  collectives on experimental backends.
- The antiperiodic time boundary and the even-odd parity masks are GLOBAL
  properties: both are rebuilt per shard from jax.lax.axis_index.
- CG control flow: every dot product is psum-complete, so all shards see
  identical residuals and the while_loop stays uniform across the mesh.
- The fermion force is jax.grad of the LOCAL shard contribution to the
  variational (gradient-exact) action form — same rule as
  domain_flow.ft_force_sharded: differentiating the psum-REDUCED action
  would double count (each shard's cotangent psums back); the ppermute
  transposes carry the cross-shard terms.
- The solver is the XLA roll stencil: the fused Pallas kernels
  (ops/pallas_fermion.py) are VMEM-resident single-device programs and do
  not compose with cross-shard halo exchange.

MTS (n_inner) and Hasenbusch are not sharded here (both measured
unprofitable at the volumes a single chip holds, BENCH.md round 3; they
would compose the same way if a target regime ever wants them).

The FT (flowed) dynamical sampler composes this module with
parallel/domain_flow.py: ONE flow VJP carries the gauge stencil, logdet,
and fermion cotangents back to latent space (schwinger.ft_dyn_force,
row-sharded) — see ft_dyn_force_sharded / run_domain_fthmc_dyn_chunked.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fthmc_tpu import fermion, lattice
from fthmc_tpu.fermion import CGResult, _cdot, _g5
from fthmc_tpu.parallel.domain import (_roll_m1_rows, _roll_p1_rows,
                                       delta_action_sharded, force_sharded,
                                       plaq_mean_sharded, topo_charge_sharded)

__all__ = ["dirac_sharded", "dirac_dag_sharded", "apply_mdagm_sharded",
           "apply_mdagm_eo_sharded", "parity_mask_sharded",
           "cg_solve_sharded", "pf_refresh_sharded",
           "pf_action_exact_sharded", "pf_action_lin_sharded",
           "dyn_force_sharded", "make_domain_hmc_dyn_step",
           "run_domain_hmc_dyn_chunked", "ft_dyn_force_sharded",
           "run_domain_fthmc_dyn_chunked"]


def _roll_rows_c(a: jnp.ndarray, shift: int, axis_name: str) -> jnp.ndarray:
    """roll(a, shift, axis=-2) for COMPLEX planes across the sharded row
    axis: real/imag travel separately (ppermute on complex operands is
    not exercised anywhere else in this repo; two small real halo rows
    cost the same on ICI)."""
    roll = _roll_m1_rows if shift == -1 else _roll_p1_rows
    return (roll(jnp.real(a), axis_name)
            + 1j * roll(jnp.imag(a), axis_name)).astype(a.dtype)


def _links_sharded(theta: jnp.ndarray, axis_name: str):
    """Effective complex links with the GLOBAL antiperiodic time boundary:
    the -1 sign lives on the global last row, i.e. on the last shard only
    (cf. fermion._links, which uses the global L0 directly)."""
    u = jnp.exp(1j * theta.astype(jnp.float32))
    u0, u1 = u[..., 0, :, :], u[..., 1, :, :]
    ls = theta.shape[-2]
    n = lax.axis_size(axis_name)
    grow = lax.axis_index(axis_name) * ls + jnp.arange(ls)
    sign = jnp.where(grow == n * ls - 1, -1.0, 1.0)[:, None]
    return u0 * sign, u1


def _hop_sharded(theta: jnp.ndarray, psi: jnp.ndarray,
                 axis_name: str) -> jnp.ndarray:
    """The half-spinor Wilson hop (fermion._hop) with the row rolls
    crossing shards; column rolls stay local."""
    u0, u1 = _links_sharded(theta, axis_name)
    s0, s1 = psi[..., 0], psi[..., 1]
    d = u0 * _roll_rows_c(s0 - s1, -1, axis_name)
    e = _roll_rows_c(jnp.conj(u0) * (s0 + s1), 1, axis_name)
    w = u1 * jnp.roll(s0 + 1j * s1, -1, axis=-1)
    v = jnp.roll(jnp.conj(u1) * (s0 - 1j * s1), 1, axis=-1)
    h0 = d + e + w + v
    h1 = -d + e - 1j * w + 1j * v
    return jnp.stack((h0, h1), axis=-1)


def dirac_sharded(theta, psi, mass: float, axis_name: str) -> jnp.ndarray:
    """Row-sharded D(theta) psi (fermion.dirac)."""
    return (mass + 2.0) * psi - 0.5 * _hop_sharded(theta, psi, axis_name)


def dirac_dag_sharded(theta, psi, mass: float, axis_name: str):
    """D^dag = g5 D g5 (g5 is site-local)."""
    return _g5(dirac_sharded(theta, _g5(psi), mass, axis_name))


def apply_mdagm_sharded(theta, psi, mass: float, axis_name: str):
    """M = D^dag D on row-sharded fields."""
    return dirac_dag_sharded(theta, dirac_sharded(theta, psi, mass,
                                                  axis_name),
                             mass, axis_name)


def parity_mask_sharded(shape_local, axis_name: str,
                        parity: int = 0) -> jnp.ndarray:
    """(L0loc, L1, 1) mask of GLOBAL parity (x0_global + x1) % 2 == parity
    (fermion.parity_mask with the shard's global row offset folded in)."""
    ls, L1 = shape_local[-3], shape_local[-2]
    grow = lax.axis_index(axis_name) * ls + jnp.arange(ls)
    p = (grow[:, None] + jnp.arange(L1)[None, :]) % 2
    return (p == parity).astype(jnp.float32)[..., None]


def dirac_hat_sharded(theta, psi_e, mass: float, axis_name: str):
    """Even-odd Schur complement Dhat on even-masked sharded fields
    (fermion.dirac_hat with global parity)."""
    me = parity_mask_sharded(psi_e.shape, axis_name, 0)
    mo = 1.0 - me
    h = me * _hop_sharded(theta, mo * _hop_sharded(theta, psi_e, axis_name),
                          axis_name)
    return (mass + 2.0) * psi_e - 0.25 / (mass + 2.0) * h


def dirac_hat_dag_sharded(theta, psi_e, mass: float, axis_name: str):
    return _g5(dirac_hat_sharded(theta, _g5(psi_e), mass, axis_name))


def apply_mdagm_eo_sharded(theta, psi_e, mass: float, axis_name: str):
    return dirac_hat_dag_sharded(
        theta, dirac_hat_sharded(theta, psi_e, mass, axis_name),
        mass, axis_name)


def _cdot_g(a, b, axis_name: str):
    """Global per-chain inner product: local _cdot + psum."""
    return lax.psum(_cdot(a, b), axis_name)


def cg_solve_sharded(theta, b, mass: float, x0=None, *, tol: float = 1e-8,
                     maxiter: int = 1000, eo: bool = False,
                     axis_name: str = "rows") -> CGResult:
    """Batched CG for (D^dag D) x = b on row-sharded fields — the mirror of
    fermion._cg_solve_xla with psum-complete dot products (identical
    while_loop control flow on every shard)."""
    def op(th, ps, m):
        return (apply_mdagm_eo_sharded if eo
                else apply_mdagm_sharded)(th, ps, m, axis_name)

    bsq = jnp.real(_cdot_g(b, b, axis_name))
    stop = tol * bsq
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - op(theta, x, mass)
    p = r
    rsq = jnp.real(_cdot_g(r, r, axis_name))

    def cond(carry):
        x, r, p, rsq, k = carry
        return jnp.logical_and(jnp.any(rsq > stop), k < maxiter)

    def body(carry):
        x, r, p, rsq, k = carry
        active = rsq > stop
        mp = op(theta, p, mass)
        denom = jnp.real(_cdot_g(p, mp, axis_name))
        alpha = jnp.where(active, rsq / jnp.maximum(denom, 1e-30), 0.0)
        al = alpha[..., None, None, None].astype(b.dtype)
        x = x + al * p
        r = r - al * mp
        rsq_new = jnp.real(_cdot_g(r, r, axis_name))
        beta = jnp.where(active, rsq_new / jnp.maximum(rsq, 1e-30), 0.0)
        p = r + beta[..., None, None, None].astype(b.dtype) * p
        rsq = jnp.where(active, rsq_new, rsq)
        return (x, r, p, rsq, k + 1)

    x, r, p, rsq, k = jax.lax.while_loop(cond, body, (x, r, p, rsq, 0))
    return CGResult(x, k, rsq / jnp.maximum(bsq, 1e-30))


def pf_refresh_sharded(key, theta, mass: float, *, eo: bool = False,
                       axis_name: str = "rows"):
    """Pseudofermion heatbath on row-sharded fields: per-shard independent
    noise rows (fold the shard index into the key), global S_pf(0)
    (fermion.pf_refresh)."""
    import math
    shape = theta.shape[:-3] + theta.shape[-2:] + (2,)
    k = jax.random.fold_in(key, lax.axis_index(axis_name))
    kr, ki = jax.random.split(k)
    chi = (jax.random.normal(kr, shape) +
           1j * jax.random.normal(ki, shape)) * math.sqrt(0.5)
    chi = chi.astype(jnp.complex64)
    if eo:
        chi = chi * parity_mask_sharded(shape, axis_name, 0)
        phi = dirac_hat_dag_sharded(theta, chi, mass, axis_name)
    else:
        phi = dirac_dag_sharded(theta, chi, mass, axis_name)
    s0 = jnp.real(_cdot_g(chi, chi, axis_name))
    return phi, s0


def _pf_action_lin_local(theta, phi, x_sol, mass: float, eo: bool,
                         axis_name: str) -> jnp.ndarray:
    """LOCAL shard contribution (no psum) to the variational action form
    fermion.pf_action_lin — the differentiation target for the force."""
    op = apply_mdagm_eo_sharded if eo else apply_mdagm_sharded
    xs = lax.stop_gradient(x_sol)
    return (2.0 * jnp.real(_cdot(xs, phi))
            - jnp.real(_cdot(xs, op(theta, xs, mass, axis_name))))


def pf_action_lin_sharded(theta, phi, x_sol, mass: float, *,
                          eo: bool = False, axis_name: str = "rows"):
    """Global variational pseudofermion action (per chain)."""
    return lax.psum(_pf_action_lin_local(theta, phi, x_sol, mass, eo,
                                         axis_name), axis_name)


def pf_action_exact_sharded(theta, phi, mass: float, *, tol: float = 1e-10,
                            maxiter: int = 2000, x0=None, eo: bool = False,
                            axis_name: str = "rows"):
    """S_pf = phi^dag M^{-1} phi via a tight sharded solve (the Metropolis
    energy; fermion.pf_action_exact)."""
    res = cg_solve_sharded(theta, phi, mass, x0, tol=tol, maxiter=maxiter,
                           eo=eo, axis_name=axis_name)
    return jnp.real(_cdot_g(phi, res.x, axis_name)), res.x


def dyn_force_sharded(x, phi, beta: float, mass: float, x_guess, *,
                      tol: float = 1e-8, maxiter: int = 1000,
                      eo: bool = False, axis_name: str = "rows"):
    """Total dynamical force on the row-sharded field: analytic gauge
    stencil (domain.force_sharded) + grad of the LOCAL fermion action
    contribution (schwinger.dyn_force, sharded). Returns (force, cg_sol)."""
    res = cg_solve_sharded(x, phi, mass, x_guess, tol=tol, maxiter=maxiter,
                           eo=eo, axis_name=axis_name)

    def s_f(th):
        return jnp.sum(_pf_action_lin_local(th, phi, res.x, mass, eo,
                                            axis_name))

    return force_sharded(x, beta, axis_name) + jax.grad(s_f)(x), res.x


# ------------------------------------------------------------- HMC kernel

def _domain_hmc_dyn_step_local(key, x, q_old, cfg, axis: str):
    """One dynamical-fermion HMC trajectory on the row-sharded field
    (shard-local program; mirrors schwinger.hmc_step_dyn). All metrics are
    psum-complete (every shard holds the global value)."""
    from fthmc_tpu.schwinger import leapfrog_aux, omelyan_aux
    kv, kp, ka = jax.random.split(key, 3)
    idx = lax.axis_index(axis)
    v0 = jax.random.normal(jax.random.fold_in(kv, idx), x.shape, x.dtype)
    phi, s_pf0 = pf_refresh_sharded(kp, x, cfg.mass, eo=cfg.eo_precond,
                                    axis_name=axis)

    def force_fn(xx, x_guess):
        guess = x_guess if cfg.warm_start else jnp.zeros_like(phi)
        return dyn_force_sharded(xx, phi, cfg.beta, cfg.mass, guess,
                                 tol=cfg.cg_tol_force,
                                 maxiter=cfg.cg_maxiter,
                                 eo=cfg.eo_precond, axis_name=axis)

    integ = omelyan_aux if cfg.integrator == "omelyan" else leapfrog_aux
    x1, v1, x_sol = integ(x, v0, cfg.dt, cfg.nstep, force_fn,
                          jnp.zeros_like(phi))
    x1 = lattice.wrap(x1)

    s_pf1, _ = pf_action_exact_sharded(
        x1, phi, cfg.mass, tol=cfg.cg_tol_mh, maxiter=cfg.cg_maxiter,
        x0=x_sol if cfg.warm_start else None, eo=cfg.eo_precond,
        axis_name=axis)
    dsg = delta_action_sharded(x1, x, cfg.beta, axis)
    dk = 0.5 * lax.psum(
        jnp.sum(((v1 - v0) * (v1 + v0)).reshape(x.shape[0], -1), axis=-1),
        axis)
    dh = dsg + (s_pf1 - s_pf0) + dk
    exp_mdh = jnp.exp(-dh)
    # same (unfolded) key on every shard -> identical accept decision
    acc = jax.random.uniform(ka, dh.shape, dh.dtype) < exp_mdh
    x_new = jnp.where(acc[:, None, None, None], x1, x)
    q_new = topo_charge_sharded(x_new, axis)
    metrics = {
        "dh": dh, "exp_mdh": exp_mdh, "acc": acc.astype(x.dtype),
        "plaq": plaq_mean_sharded(x_new, axis), "q": q_new,
        "dq": jnp.abs(q_new - q_old),
    }
    return x_new, q_new, metrics


def _check_cfg(cfg, n_dev: int):
    if cfg.n_inner > 0 or cfg.hasenbusch_dm > 0:
        raise ValueError("domain-decomposed dynamical HMC is single-scale "
                         "(MTS/Hasenbusch not sharded; see module docs)")
    assert cfg.L % n_dev == 0, (cfg.L, n_dev)
    if (cfg.L // n_dev) % 2 != 0 and cfg.eo_precond:
        raise ValueError("eo preconditioning needs an even number of rows "
                         f"per shard (L={cfg.L}, devices={n_dev})")


def make_domain_hmc_dyn_step(mesh: Mesh, cfg, axis: str = "rows"):
    """Compile one row-sharded dynamical HMC step. Returns
    step(key, x, q_old) -> (x', q', metrics dict); x must be placed with
    NamedSharding(mesh, P(None, None, axis, None))."""
    _check_cfg(cfg, mesh.devices.size)
    xspec = P(None, None, axis, None)
    mspec = {k: P() for k in ("dh", "exp_mdh", "acc", "plaq", "q", "dq")}

    def _step(key, x, q_old):
        return _domain_hmc_dyn_step_local(key, x, q_old, cfg, axis)

    return jax.jit(jax.shard_map(
        _step, mesh=mesh, in_specs=(P(), xspec, P()),
        out_specs=(xspec, P(), mspec), check_vma=False))


@lru_cache(maxsize=None)
def _domain_hmc_dyn_run_fn(mesh: Mesh, axis: str, cfg, ntraj: int):
    """Cached compiled scan of ntraj row-sharded dynamical trajectories
    (the whole block INSIDE shard_map — one dispatch per block)."""
    xspec = P(None, None, axis, None)
    mspec = {k: P() for k in ("dh", "exp_mdh", "acc", "plaq", "q", "dq")}

    def local(key, x0):
        q0 = topo_charge_sharded(x0, axis)

        def body(carry, k):
            x, q = carry
            x, q, m = _domain_hmc_dyn_step_local(k, x, q, cfg, axis)
            return (x, q), m

        keys = jax.random.split(key, ntraj)
        (x, _), hist = jax.lax.scan(body, (x0, q0), keys)
        return x, hist

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), xspec), out_specs=(xspec, mspec),
        check_vma=False))


def ft_dyn_force_sharded(params, spec, z, cfg, phi, x_guess, L0: int,
                         axis_name: str, remat: bool = True):
    """dS_eff/dz for the row-sharded dynamical theory: ONE flow VJP
    carries gauge stencil + logdet + fermion cotangents back to latent
    space (schwinger.ft_dyn_force composed with domain_flow). The
    differentiation target is the LOCAL shard contribution (reduce=False
    forward, local action terms) — the domain_flow double-count rule.
    Returns (force_z, cg_solution)."""
    from fthmc_tpu.parallel.domain import plaq_phase_sharded
    from fthmc_tpu.parallel.domain_flow import flow_forward_sharded

    (x, logdet_local), vjp = jax.vjp(
        lambda zz: flow_forward_sharded(params, zz, spec, L0, axis_name,
                                        remat=remat, reduce=False), z)
    res = cg_solve_sharded(lax.stop_gradient(x), phi, cfg.mass, x_guess,
                           tol=cfg.cg_tol_force, maxiter=cfg.cg_maxiter,
                           eo=cfg.eo_precond, axis_name=axis_name)

    def s_x(xx):
        sg = -cfg.beta * jnp.sum(
            jnp.cos(plaq_phase_sharded(xx, axis_name)), axis=(1, 2))
        sf = _pf_action_lin_local(xx, phi, res.x, cfg.mass, cfg.eo_precond,
                                  axis_name)
        return jnp.sum(sg + sf)

    gx = jax.grad(s_x)(x)
    gz, = vjp((gx, -jnp.ones_like(logdet_local)))
    return gz, res.x


def _domain_fthmc_dyn_step_local(params, key, z, q_old, cfg, spec, L0: int,
                                 axis: str, remat: bool = True):
    """One row-sharded dynamical FT-HMC trajectory (shard-local program;
    mirrors schwinger.fthmc_step_dyn — pseudofermion heatbath on the
    PHYSICAL field y = T(z))."""
    from fthmc_tpu.parallel.domain import plaq_phase_sharded
    from fthmc_tpu.parallel.domain_flow import flow_forward_sharded
    from fthmc_tpu.schwinger import leapfrog_aux, omelyan_aux

    kv, kp, ka = jax.random.split(key, 3)
    idx = lax.axis_index(axis)
    v0 = jax.random.normal(jax.random.fold_in(kv, idx), z.shape, z.dtype)

    y0, logdet0 = flow_forward_sharded(params, z, spec, L0, axis,
                                       remat=remat)
    phi, s_pf0 = pf_refresh_sharded(kp, y0, cfg.mass, eo=cfg.eo_precond,
                                    axis_name=axis)

    def force_fn(zz, x_guess):
        guess = x_guess if cfg.warm_start else jnp.zeros_like(phi)
        return ft_dyn_force_sharded(params, spec, zz, cfg, phi, guess,
                                    L0, axis, remat)

    integ = omelyan_aux if cfg.integrator == "omelyan" else leapfrog_aux
    z1, v1, x_sol = integ(z, v0, cfg.dt, cfg.nstep, force_fn,
                          jnp.zeros_like(phi))
    z1 = lattice.wrap(z1)
    y1, logdet1 = flow_forward_sharded(params, z1, spec, L0, axis,
                                       remat=remat)

    s_pf1, _ = pf_action_exact_sharded(
        y1, phi, cfg.mass, tol=cfg.cg_tol_mh, maxiter=cfg.cg_maxiter,
        x0=x_sol if cfg.warm_start else None, eo=cfg.eo_precond,
        axis_name=axis)
    dsw = -cfg.beta * lax.psum(
        jnp.sum(jnp.cos(plaq_phase_sharded(y1, axis))
                - jnp.cos(plaq_phase_sharded(y0, axis)), axis=(1, 2)),
        axis)
    dk = 0.5 * lax.psum(
        jnp.sum(((v1 - v0) * (v1 + v0)).reshape(z.shape[0], -1), axis=-1),
        axis)
    dh = dsw + (s_pf1 - s_pf0) - (logdet1 - logdet0) + dk
    exp_mdh = jnp.exp(-dh)
    acc = jax.random.uniform(ka, dh.shape, dh.dtype) < exp_mdh
    accb = acc[:, None, None, None]
    z_new = jnp.where(accb, z1, z)
    y_new = jnp.where(accb, y1, y0)
    q_new = topo_charge_sharded(y_new, axis)
    metrics = {
        "dh": dh, "exp_mdh": exp_mdh, "acc": acc.astype(z.dtype),
        "plaq": plaq_mean_sharded(y_new, axis), "q": q_new,
        "dq": jnp.abs(q_new - q_old),
    }
    return z_new, q_new, metrics


@lru_cache(maxsize=None)
def _domain_fthmc_dyn_run_fn(mesh: Mesh, axis: str, spec, cfg, ntraj: int,
                             L0: int, remat: bool):
    """Cached compiled scan of ntraj row-sharded dynamical FT-HMC
    trajectories."""
    from fthmc_tpu.parallel.domain_flow import flow_forward_sharded
    zspec = P(None, None, axis, None)
    mspec = {k: P() for k in ("dh", "exp_mdh", "acc", "plaq", "q", "dq")}

    def local(params, key, z0):
        y0, _ = flow_forward_sharded(params, z0, spec, L0, axis,
                                     remat=remat)
        q0 = topo_charge_sharded(y0, axis)

        def body(carry, k):
            z, q = carry
            z, q, m = _domain_fthmc_dyn_step_local(params, k, z, q, cfg,
                                                   spec, L0, axis,
                                                   remat=remat)
            return (z, q), m

        keys = jax.random.split(key, ntraj)
        (z, _), hist = jax.lax.scan(body, (z0, q0), keys)
        return z, hist

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), zspec),
        out_specs=(zspec, mspec), check_vma=False))


def run_domain_fthmc_dyn_chunked(mesh: Mesh, params, spec, cfg, *,
                                 block: int = 32, z0=None, key=None,
                                 callback=None, axis: str = "rows",
                                 remat: bool = True):
    """Blocked row-sharded dynamical FT-HMC driver. cfg is a
    schwinger.SchwingerConfig; the latent chain state z is row-sharded and
    the flow params replicated. Returns (z_final sharded, history dict of
    host numpy (ntraj, B) arrays)."""
    import numpy as np
    n_dev = mesh.devices.size
    _check_cfg(cfg, n_dev)
    if key is None:
        key = jax.random.PRNGKey(0)
    if z0 is None:
        z0 = lattice.hot_start(jax.random.fold_in(key, 7), cfg.n_chains,
                               cfg.L)
    z = jax.device_put(z0, NamedSharding(mesh, P(None, None, axis, None)))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    run_cfg = dataclasses.replace(cfg, ntraj=0)
    blocks, done = [], 0
    while done < cfg.ntraj:
        n = min(block, cfg.ntraj - done)
        key, krun = jax.random.split(key)
        run = _domain_fthmc_dyn_run_fn(mesh, axis, spec, run_cfg, n,
                                       cfg.L, remat)
        z, hist = run(params, krun, z)
        jax.block_until_ready(z)
        blocks.append({k: np.asarray(v) for k, v in hist.items()})
        done += n
        if callback is not None:
            callback(done, blocks[-1])
    cat = {k: np.concatenate([b[k] for b in blocks]) for k in blocks[0]}
    return z, cat


def run_domain_hmc_dyn_chunked(mesh: Mesh, cfg, *, block: int = 64,
                               x0=None, key=None, callback=None,
                               axis: str = "rows"):
    """Blocked row-sharded dynamical-HMC driver (bounded device-run length,
    the production rule). cfg is a schwinger.SchwingerConfig. Returns
    (x_final sharded, history dict of host numpy (ntraj, B) arrays)."""
    import numpy as np
    n_dev = mesh.devices.size
    _check_cfg(cfg, n_dev)
    if key is None:
        key = jax.random.PRNGKey(0)
    if x0 is None:
        x0 = lattice.hot_start(jax.random.fold_in(key, 7), cfg.n_chains,
                               cfg.L)
    x = jax.device_put(x0, NamedSharding(mesh, P(None, None, axis, None)))
    # block length is the static arg; drop ntraj so totals share the cache
    run_cfg = dataclasses.replace(cfg, ntraj=0)
    blocks, done = [], 0
    while done < cfg.ntraj:
        n = min(block, cfg.ntraj - done)
        key, krun = jax.random.split(key)
        run = _domain_hmc_dyn_run_fn(mesh, axis, run_cfg, n)
        x, hist = run(krun, x)
        jax.block_until_ready(x)
        blocks.append({k: np.asarray(v) for k, v in hist.items()})
        done += n
        if callback is not None:
            callback(done, blocks[-1])
    cat = {k: np.concatenate([b[k] for b in blocks]) for k in blocks[0]}
    return x, cat
