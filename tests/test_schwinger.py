"""Dynamical-fermion (Schwinger model) HMC / FT-HMC invariants.

Small lattices + few trajectories (CPU test mesh is slow); the statistical
physics checks (heavy-mass limit -> pure-gauge plaquette) are marked slow.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu import fermion, lattice, schwinger
from fthmc_tpu.config import FlowSpec
from fthmc_tpu.models.flow import init_flow_params
from fthmc_tpu.schwinger import (SchwingerConfig, hmc_step_dyn, run_hmc_dyn,
                                 run_hmc_dyn_chunked, fthmc_step_dyn,
                                 run_fthmc_dyn)


CFG = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5, nstep=10,
                      n_chains=4, ntraj=4, cg_tol_force=1e-10,
                      cg_tol_mh=1e-12, cg_maxiter=400)


def test_exp_mdh_near_one_small_dt():
    """With a fine integrator dH is O(dt^2) per chain: exp(-dH) ~ 1."""
    cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.25, nstep=25,
                          n_chains=4, ntraj=2, cg_tol_force=1e-12,
                          cg_tol_mh=1e-12, cg_maxiter=400)
    x, hist = run_hmc_dyn(cfg, key=jax.random.PRNGKey(0))
    dh = np.asarray(hist.dh)
    assert np.all(np.abs(dh) < 0.05), dh
    assert np.all(np.asarray(hist.acc)[-1] >= 0)  # ran to completion


def test_dh_scales_as_dt_squared():
    """Halving dt at fixed tau must cut |dH| ~4x (2nd-order integrator).
    Also implicitly checks the force solve is accurate enough not to spoil
    the integrator order."""
    def max_dh(nstep):
        cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5, nstep=nstep,
                              n_chains=4, ntraj=1, integrator="leapfrog",
                              cg_tol_force=1e-12, cg_tol_mh=1e-12,
                              cg_maxiter=400)
        x0 = lattice.hot_start(jax.random.PRNGKey(3), 4, 4)
        _, hist = run_hmc_dyn(cfg, x0=x0, key=jax.random.PRNGKey(1))
        return float(np.abs(np.asarray(hist.dh)).max())

    a, b = max_dh(8), max_dh(16)
    assert b < a / 2.5, (a, b)


def test_reversibility():
    """Integrate forward, flip momentum, integrate back: recover the start
    to fp32 tolerance (cold CG starts -> trajectory is exactly
    time-reversible up to solver determinism)."""
    cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5, nstep=10,
                          n_chains=2, warm_start=False,
                          cg_tol_force=1e-12, cg_maxiter=400)
    x = lattice.hot_start(jax.random.PRNGKey(5), 2, 4)
    v = jax.random.normal(jax.random.PRNGKey(6), x.shape, x.dtype)
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(7), x, cfg.mass)

    def ff(xx, aux):
        return schwinger.dyn_force(xx, phi, cfg.beta, cfg.mass,
                                   jnp.zeros_like(phi), cfg.cg_tol_force,
                                   cfg.cg_maxiter)

    x1, v1, _ = schwinger.omelyan_aux(x, v, cfg.dt, cfg.nstep, ff,
                                      jnp.zeros_like(phi))
    x2, v2, _ = schwinger.omelyan_aux(x1, -v1, cfg.dt, cfg.nstep, ff,
                                      jnp.zeros_like(phi))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-4)
    np.testing.assert_allclose(np.asarray(-v2), np.asarray(v), atol=5e-4)


def test_ft_identity_flow_matches_plain():
    """FT-HMC with an identity flow is plain dynamical HMC: same dH
    statistics for the same key stream (the flow contributes nothing)."""
    spec = FlowSpec(n_layers=0)
    params = init_flow_params(jax.random.PRNGKey(0), spec)
    x0 = lattice.hot_start(jax.random.PRNGKey(9), 2, 4)
    q0 = lattice.batch_charges(x0)
    cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5, nstep=8,
                          n_chains=2, cg_tol_force=1e-12, cg_tol_mh=1e-12,
                          cg_maxiter=400)
    key = jax.random.PRNGKey(11)
    x_p, q_p, m_p = hmc_step_dyn(key, x0, q0, cfg)
    z_f, y_f, q_f, m_f = fthmc_step_dyn(params, spec, key, x0, q0, cfg)
    np.testing.assert_allclose(np.asarray(m_f.dh), np.asarray(m_p.dh),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(x_p), atol=1e-5)


def test_ft_random_flow_exp_mdh():
    """A RANDOM (untrained) flow still gives exp(-dH) ~ 1 at fine dt — the
    effective action/force pair is consistent through the flow VJP."""
    spec = FlowSpec(n_layers=2, coupling="rncp", n_mixture=2,
                    hidden_sizes=(8, 8))
    params = init_flow_params(jax.random.PRNGKey(1), spec)
    cfg = SchwingerConfig(L=4, beta=1.5, mass=0.4, tau=0.2, nstep=20,
                          n_chains=2, ntraj=2, cg_tol_force=1e-12,
                          cg_tol_mh=1e-12, cg_maxiter=400)
    z, hist = run_fthmc_dyn(params, spec, cfg, key=jax.random.PRNGKey(2))
    dh = np.asarray(hist.dh)
    assert np.all(np.abs(dh) < 0.08), dh


def test_chunked_matches_whole_run_shapes():
    x, h = run_hmc_dyn_chunked(CFG, block=2, key=jax.random.PRNGKey(3))
    assert np.asarray(h.acc).shape == (CFG.ntraj, CFG.n_chains)
    assert bool(jnp.all(jnp.isfinite(h.dh)))


def test_warm_start_preserves_exp_mdh():
    """Warm-started force solves (chronological inverter) must not shift
    dH beyond integrator error at these tolerances."""
    cfg_cold = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5, nstep=12,
                               n_chains=4, ntraj=2, warm_start=False,
                               cg_tol_force=1e-10, cg_tol_mh=1e-12,
                               cg_maxiter=400)
    cfg_warm = SchwingerConfig(**{**dataclass_asdict(cfg_cold),
                                  "warm_start": True})
    x0 = lattice.hot_start(jax.random.PRNGKey(13), 4, 4)
    _, h_c = run_hmc_dyn(cfg_cold, x0=x0, key=jax.random.PRNGKey(14))
    _, h_w = run_hmc_dyn(cfg_warm, x0=x0, key=jax.random.PRNGKey(14))
    np.testing.assert_allclose(np.asarray(h_w.dh), np.asarray(h_c.dh),
                               atol=1e-3)


def dataclass_asdict(cfg):
    import dataclasses
    return dataclasses.asdict(cfg)


@pytest.mark.slow
def test_heavy_mass_limit_reproduces_pure_gauge():
    """At m >> 1 the fermion determinant is ~ field independent: the
    plaquette must land on the pure-gauge exact value I_1/I_0(beta)."""
    cfg = SchwingerConfig(L=8, beta=2.0, mass=25.0, tau=1.0, nstep=12,
                          n_chains=16, ntraj=400, cg_tol_force=1e-10,
                          cg_tol_mh=1e-12, cg_maxiter=100)
    x, hist = run_hmc_dyn_chunked(cfg, block=100, key=jax.random.PRNGKey(4))
    p = np.asarray(hist.plaq)[200:].mean()
    e = np.asarray(hist.exp_mdh)[200:].mean()
    assert abs(p - lattice.PLAQ_EXACT[2.0]) < 6e-3, p
    assert abs(e - 1.0) < 0.05, e


@pytest.mark.slow
def test_dynamical_fermions_shift_plaquette_up():
    """Light Wilson fermions at beta=1 raise <plaq> above pure gauge (the
    determinant favors ordered fields) — a qualitative physics check that
    the force actually acts."""
    cfg = SchwingerConfig(L=8, beta=1.0, mass=0.1, tau=1.0, nstep=16,
                          n_chains=16, ntraj=300, cg_tol_force=1e-9,
                          cg_tol_mh=1e-12, cg_maxiter=400)
    x, hist = run_hmc_dyn_chunked(cfg, block=75, key=jax.random.PRNGKey(8))
    p = np.asarray(hist.plaq)[150:].mean()
    assert p > lattice.PLAQ_EXACT[1.0] + 0.02, p


# ------------------------------------------------- multi-timescale (MTS)

def test_mts_exp_mdh_near_one():
    """Nested Sexton-Weingarten integrator at fine scales: dH is small and
    exp(-dH) ~ 1 (reversible + volume-preserving composition)."""
    cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5, nstep=5,
                          n_inner=5, n_chains=4, ntraj=2,
                          cg_tol_force=1e-12, cg_tol_mh=1e-12,
                          cg_maxiter=400)
    _, hist = run_hmc_dyn(cfg, key=jax.random.PRNGKey(21))
    dh = np.asarray(hist.dh)
    assert np.all(np.abs(dh) < 0.05), dh


@pytest.mark.slow
def test_mts_dh_scales_as_dt_squared():
    """Halving the OUTER dt (fixed tau, fixed fine dt) cuts |dH| ~4x:
    the nesting preserves 2nd-order accuracy."""
    def max_dh(nstep, n_inner):
        cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5,
                              nstep=nstep, n_inner=n_inner, n_chains=4,
                              ntraj=1, cg_tol_force=1e-12, cg_tol_mh=1e-12,
                              cg_maxiter=400)
        x0 = lattice.hot_start(jax.random.PRNGKey(3), 4, 4)
        _, hist = run_hmc_dyn(cfg, x0=x0, key=jax.random.PRNGKey(1))
        return float(np.abs(np.asarray(hist.dh)).max())

    a, b = max_dh(4, 8), max_dh(8, 4)   # same fine dt, outer dt halves
    assert b < a / 2.0, (a, b)


@pytest.mark.slow
def test_mts_reversibility():
    """Forward-integrate, flip momentum, integrate back: recover the start
    (cold CG force solves -> exactly time-reversible)."""
    cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5, nstep=5,
                          n_inner=4, n_chains=2, warm_start=False,
                          cg_tol_force=1e-12, cg_maxiter=400)
    x = lattice.hot_start(jax.random.PRNGKey(5), 2, 4)
    v = jax.random.normal(jax.random.PRNGKey(6), x.shape, x.dtype)
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(7), x, cfg.mass)

    def ff(xx, aux):
        res = fermion.cg_solve(xx, phi, cfg.mass, jnp.zeros_like(phi),
                               tol=cfg.cg_tol_force, maxiter=cfg.cg_maxiter)

        def s_f(th):
            return jnp.sum(fermion.pf_action_lin(th, phi, res.x, cfg.mass))

        return jax.grad(s_f)(xx), res.x

    def fg(xx):
        return jax.vmap(lambda c: lattice.force(c, cfg.beta))(xx)

    x1, v1, _ = schwinger.nested_leapfrog_aux(
        x, v, cfg.dt, cfg.nstep, cfg.n_inner, ff, fg, jnp.zeros_like(phi))
    x2, v2, _ = schwinger.nested_leapfrog_aux(
        x1, -v1, cfg.dt, cfg.nstep, cfg.n_inner, ff, fg,
        jnp.zeros_like(phi))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-4)
    np.testing.assert_allclose(np.asarray(-v2), np.asarray(v), atol=5e-4)


def test_ft_force_split_sums_to_total():
    """ft_gauge_force + ft_fermion_force == ft_dyn_force (the single-scale
    total): the MTS splitting re-partitions the same S_eff gradient."""
    spec = FlowSpec(n_layers=2, coupling="rncp", n_mixture=2,
                    hidden_sizes=(8, 8))
    params = init_flow_params(jax.random.PRNGKey(1), spec)
    cfg = SchwingerConfig(L=4, beta=1.5, mass=0.4, cg_tol_force=1e-12,
                          cg_maxiter=400)
    z = lattice.hot_start(jax.random.PRNGKey(22), 2, 4)
    from fthmc_tpu.models.flow import flow_forward
    x, _ = flow_forward(params, z, spec)
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(23), x,
                                cfg.mass, eo=cfg.eo_precond)
    guess = jnp.zeros_like(phi)
    total, _ = schwinger.ft_dyn_force(params, spec, z, cfg, phi, guess,
                                      False)
    fg = schwinger.ft_gauge_force(params, spec, z, cfg.beta, False)
    ffm, _ = schwinger.ft_fermion_force(params, spec, z, cfg, phi, guess,
                                        False)
    np.testing.assert_allclose(np.asarray(fg + ffm), np.asarray(total),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_ft_mts_exp_mdh_near_one():
    """FT-HMC with the nested integrator and a random flow: exp(-dH) ~ 1."""
    spec = FlowSpec(n_layers=2, coupling="rncp", n_mixture=2,
                    hidden_sizes=(8, 8))
    params = init_flow_params(jax.random.PRNGKey(1), spec)
    cfg = SchwingerConfig(L=4, beta=1.5, mass=0.4, tau=0.2, nstep=5,
                          n_inner=4, n_chains=2, ntraj=2,
                          cg_tol_force=1e-12, cg_tol_mh=1e-12,
                          cg_maxiter=400)
    z, hist = run_fthmc_dyn(params, spec, cfg, key=jax.random.PRNGKey(2))
    dh = np.asarray(hist.dh)
    assert np.all(np.abs(dh) < 0.08), dh


# ---------------------------------------------- Hasenbusch preconditioning

def test_hasenbusch_exp_mdh_near_one():
    """Heatbath + ratio action/force consistency: at fine steps dH ~ 0 for
    the 3-level nested integrator (validates S1/S2 split, the W^{-dag}
    heatbath, and the variational ratio force in one shot)."""
    cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, hasenbusch_dm=0.5,
                          tau=0.4, nstep=4, n_mid=2, n_inner=2,
                          n_chains=4, ntraj=2, cg_tol_force=1e-12,
                          cg_tol_mh=1e-12, cg_maxiter=400)
    _, hist = run_hmc_dyn(cfg, key=jax.random.PRNGKey(31))
    dh = np.asarray(hist.dh)
    assert np.all(np.abs(dh) < 0.05), dh


@pytest.mark.slow
def test_hasenbusch_dh_scales_as_dt_squared():
    def max_dh(nstep):
        cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, hasenbusch_dm=0.5,
                              tau=0.5, nstep=nstep, n_mid=2, n_inner=2,
                              n_chains=4, ntraj=1, cg_tol_force=1e-12,
                              cg_tol_mh=1e-12, cg_maxiter=400)
        x0 = lattice.hot_start(jax.random.PRNGKey(3), 4, 4)
        _, hist = run_hmc_dyn(cfg, x0=x0, key=jax.random.PRNGKey(1))
        return float(np.abs(np.asarray(hist.dh)).max())

    a, b = max_dh(2), max_dh(4)
    assert b < a / 2.0, (a, b)


def test_hasenbusch_start_action_is_chi_sq():
    """S1 + S2 at the heatbath point equals chi1^2 + chi2^2 EXACTLY (no
    solve needed at trajectory start) - checked by re-solving."""
    x = lattice.hot_start(jax.random.PRNGKey(41), 2, 4)
    m, m1 = 0.3, 0.8
    phi1, phi2, s0 = fermion.hasenbusch_refresh(
        jax.random.PRNGKey(42), x, m, m1, tol=1e-14, maxiter=600, eo=True)
    s1, _ = fermion.pf_action_exact(x, phi1, m1, tol=1e-14, maxiter=600,
                                    eo=True)
    s2, _ = fermion.ratio_action_exact(x, phi2, m, m1, tol=1e-14,
                                       maxiter=600, eo=True)
    np.testing.assert_allclose(np.asarray(s1 + s2), np.asarray(s0),
                               rtol=2e-4)


@pytest.mark.slow
def test_hasenbusch_matches_standard_pf_plaquette():
    """The Hasenbusch split simulates the SAME theory: <plaq> agrees with
    the standard single-pseudofermion sampler within statistics."""
    base = dict(L=6, beta=2.0, mass=0.3, tau=1.0, n_chains=16, ntraj=300,
                cg_tol_force=1e-10, cg_tol_mh=1e-12, cg_maxiter=400)
    cfg_std = SchwingerConfig(nstep=10, **base)
    cfg_hb = SchwingerConfig(nstep=3, n_mid=2, n_inner=3,
                             hasenbusch_dm=0.5, **base)
    _, h_std = run_hmc_dyn_chunked(cfg_std, block=100,
                                   key=jax.random.PRNGKey(50))
    _, h_hb = run_hmc_dyn_chunked(cfg_hb, block=100,
                                  key=jax.random.PRNGKey(51))
    p_std = np.asarray(h_std.plaq)[150:].mean()
    p_hb = np.asarray(h_hb.plaq)[150:].mean()
    e_std = np.asarray(h_std.plaq)[150:].std() / np.sqrt(150)
    assert abs(p_std - p_hb) < 6 * max(e_std, 1e-4), (p_std, p_hb)
    assert abs(np.asarray(h_hb.exp_mdh)[150:].mean() - 1.0) < 0.05


def test_mixed_cg_backend_full_step_exact():
    """A full dynamical HMC run with the mixed-precision CG backend
    (bf16 inner + f32 refinement) reproduces the xla-backend run: the
    refinement restores f32-solve accuracy, so dH per trajectory agrees
    to the CG tolerance, not to bf16."""
    cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.25, nstep=10,
                          n_chains=4, ntraj=2, cg_tol_force=1e-10,
                          cg_tol_mh=1e-12, cg_maxiter=400)
    fermion.set_cg_backend("mixed")
    try:
        jax.clear_caches()   # backend is resolved at trace time
        x_m, h_m = schwinger.run_hmc_dyn(cfg, key=jax.random.PRNGKey(5))
    finally:
        fermion.set_cg_backend("xla")
        jax.clear_caches()
    x_r, h_r = schwinger.run_hmc_dyn(cfg, key=jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(h_m.dh), np.asarray(h_r.dh),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_r), atol=1e-3)
    assert np.all(np.abs(np.asarray(h_m.dh)) < 0.05)
