"""Wilson-Dirac operator, CG, and pseudofermion force correctness.

Strategy: build the DENSE Dirac matrix on a tiny lattice by applying
``dirac`` to unit vectors, then check every property against dense linear
algebra (hermiticity structure, gamma5-hermiticity, positive-definiteness of
M = D^dag D, CG vs direct solve, force vs finite differences).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu import fermion, lattice

L = 4
MASS = 0.3


def _rand_theta(key, batch=None, l=L):
    shape = ((2, l, l) if batch is None else (batch, 2, l, l))
    return jax.random.uniform(key, shape, jnp.float32, -math.pi, math.pi)


def _dense(theta, mass, op=fermion.dirac):
    """Dense matrix of a linear operator on (L, L, 2) complex fields."""
    n = L * L * 2
    eye = jnp.eye(n, dtype=jnp.complex64).reshape(n, L, L, 2)
    cols = jax.vmap(lambda v: op(theta, v, mass).reshape(n))(eye)
    return np.asarray(cols).T  # column j = op(e_j)


def test_dirac_dag_is_adjoint():
    theta = _rand_theta(jax.random.PRNGKey(0))
    d = _dense(theta, MASS, fermion.dirac)
    ddag = _dense(theta, MASS, fermion.dirac_dag)
    np.testing.assert_allclose(ddag, d.conj().T, atol=1e-5)


def test_gamma5_hermiticity_dense():
    """gamma_5 D gamma_5 = D^dag as a dense-matrix identity."""
    theta = _rand_theta(jax.random.PRNGKey(1))
    d = _dense(theta, MASS, fermion.dirac)
    g5 = np.kron(np.eye(L * L), np.diag([1.0, -1.0])).astype(np.complex64)
    np.testing.assert_allclose(g5 @ d @ g5, d.conj().T, atol=1e-5)


def test_mdagm_hermitian_positive_definite():
    theta = _rand_theta(jax.random.PRNGKey(2))
    m = _dense(theta, MASS, fermion.apply_mdagm)
    np.testing.assert_allclose(m, m.conj().T, atol=1e-5)
    w = np.linalg.eigvalsh(m)
    assert w.min() > 0


def test_free_field_spectrum():
    """theta = 0, periodic-space/antiperiodic-time plane waves diagonalize
    the free Wilson operator: eigenvalues of M = |m + 2 - sum cos k|^2 +
    sum sin^2 k over the allowed momenta."""
    theta = jnp.zeros((2, L, L), jnp.float32)
    m = _dense(theta, MASS, fermion.apply_mdagm)
    w = np.sort(np.linalg.eigvalsh(m))
    k0 = (2 * np.pi * (np.arange(L) + 0.5)) / L   # antiperiodic
    k1 = (2 * np.pi * np.arange(L)) / L           # periodic
    expect = []
    for a in k0:
        for b in k1:
            wil = MASS + 2 - np.cos(a) - np.cos(b)
            ssq = np.sin(a) ** 2 + np.sin(b) ** 2
            expect += [wil ** 2 + ssq] * 2       # 2 spinor components
    np.testing.assert_allclose(w, np.sort(expect), rtol=1e-4)


def test_cg_matches_direct_solve():
    theta = _rand_theta(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    b = (jax.random.normal(key, (L, L, 2)) +
         1j * jax.random.normal(jax.random.fold_in(key, 1), (L, L, 2))
         ).astype(jnp.complex64)
    res = fermion.cg_solve(theta, b, MASS, tol=1e-12, maxiter=500)
    m = _dense(theta, MASS, fermion.apply_mdagm)
    x_direct = np.linalg.solve(m, np.asarray(b).reshape(-1))
    np.testing.assert_allclose(np.asarray(res.x).reshape(-1), x_direct,
                               atol=2e-4)
    assert float(res.rsq.max()) < 1e-11


def test_cg_batched_converges_per_chain():
    theta = _rand_theta(jax.random.PRNGKey(5), batch=3)
    key = jax.random.PRNGKey(6)
    b = (jax.random.normal(key, (3, L, L, 2)) +
         1j * jax.random.normal(jax.random.fold_in(key, 1), (3, L, L, 2))
         ).astype(jnp.complex64)
    res = fermion.cg_solve(theta, b, MASS, tol=1e-10, maxiter=500)
    # every chain solved: M x == b per chain
    mb = fermion.apply_mdagm(theta, res.x, MASS)
    np.testing.assert_allclose(np.asarray(mb), np.asarray(b), atol=2e-4)
    assert res.rsq.shape == (3,)


def test_pf_refresh_energy_identity():
    """phi = D^dag chi gives S_pf = chi^dag chi exactly: verify by solving
    back M^{-1} phi and contracting."""
    theta = _rand_theta(jax.random.PRNGKey(7), batch=2)
    phi, s0 = fermion.pf_refresh(jax.random.PRNGKey(8), theta, MASS)
    s, _ = fermion.pf_action_exact(theta, phi, MASS, tol=1e-12)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=1e-4)


def test_pf_action_lin_value_matches_exact():
    theta = _rand_theta(jax.random.PRNGKey(9))
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(10), theta, MASS)
    s_exact, x = fermion.pf_action_exact(theta, phi, MASS, tol=1e-12)
    s_lin = fermion.pf_action_lin(theta, phi, x, MASS)
    np.testing.assert_allclose(float(s_lin), float(s_exact), rtol=1e-5)


def test_pf_force_matches_finite_difference():
    """dS_pf/dtheta from the variational form vs central finite differences
    of the tightly-solved exact action (fp32 lattice, so expect ~1e-2 rel)."""
    theta = _rand_theta(jax.random.PRNGKey(11))
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(12), theta, MASS)
    f, _ = fermion.pf_force(theta, phi, MASS, tol=1e-12, maxiter=800)
    eps = 1e-3
    rng = np.random.default_rng(0)
    for _ in range(4):
        mu, i, j = rng.integers(0, 2), rng.integers(0, L), rng.integers(0, L)
        dth = jnp.zeros_like(theta).at[mu, i, j].set(eps)
        sp, _ = fermion.pf_action_exact(theta + dth, phi, MASS, tol=1e-12)
        sm, _ = fermion.pf_action_exact(theta - dth, phi, MASS, tol=1e-12)
        fd = (float(sp) - float(sm)) / (2 * eps)
        assert abs(fd - float(f[mu, i, j])) < 2e-2 * max(1.0, abs(fd)), (
            (mu, i, j, fd, float(f[mu, i, j])))


def test_pf_force_gauge_covariance():
    """The fermion force, like the action, is invariant under gauge
    transformations of theta (links rotate, S_pf(theta, phi) with phi also
    rotated is invariant; check the simpler exact statement: a CONSTANT
    shift of all theta by a pure-gauge form leaves S_pf invariant when phi
    is regenerated from the same chi)."""
    key = jax.random.PRNGKey(13)
    theta = _rand_theta(key)
    # gauge transform: theta_mu(x) -> theta_mu(x) + w(x) - w(x + mu)
    w = jax.random.uniform(jax.random.PRNGKey(14), (L, L), jnp.float32,
                           -math.pi, math.pi)
    th2 = jnp.stack((theta[0] + w - jnp.roll(w, -1, axis=0),
                     theta[1] + w - jnp.roll(w, -1, axis=1)))
    # spectrum of M is gauge invariant -> compare eigenvalues
    m1 = np.linalg.eigvalsh(_dense(theta, MASS, fermion.apply_mdagm))
    m2 = np.linalg.eigvalsh(_dense(th2, MASS, fermion.apply_mdagm))
    np.testing.assert_allclose(m1, m2, rtol=2e-4)


def test_chiral_condensate_free_field():
    """At theta=0 the condensate is computable exactly in momentum space:
    <psibar psi> = (1/V) sum_k 2 * wil(k) / (wil(k)^2 + sin^2 k)."""
    l = 8
    theta = jnp.zeros((2, l, l), jnp.float32)
    got = float(fermion.chiral_condensate(
        jax.random.PRNGKey(15), theta, MASS, n_noise=256, tol=1e-12))
    k0 = (2 * np.pi * (np.arange(l) + 0.5)) / l
    k1 = (2 * np.pi * np.arange(l)) / l
    tot = 0.0
    for a in k0:
        for b in k1:
            wil = MASS + 2 - np.cos(a) - np.cos(b)
            ssq = np.sin(a) ** 2 + np.sin(b) ** 2
            tot += 2 * wil / (wil ** 2 + ssq)
    expect = tot / (l * l * 2)
    assert abs(got - expect) < 0.05 * abs(expect), (got, expect)


def test_pion_correlator_free_field():
    """theta=0: C(t) computable from the exact free propagator in momentum
    space. Check shape, positivity, time-reflection symmetry (antiperiodic
    cosh form), and the exact values."""
    l = 8
    theta = jnp.zeros((2, l, l), jnp.float32)
    c = np.asarray(fermion.pion_correlator(theta, MASS, tol=1e-14))
    assert c.shape == (l,)
    assert np.all(c > 0)
    # exact: S(x) = (1/V) sum_k e^{ikx} (wil - i gamma.s)/(wil^2+s^2);
    # C(t) = sum_{x1,ab} |S|^2 -- build the free propagator densely
    k0 = 2 * np.pi * (np.arange(l) + 0.5) / l
    k1 = 2 * np.pi * np.arange(l) / l
    g0 = np.array([[0, 1], [1, 0]], complex)
    g1 = np.array([[0, -1j], [1j, 0]], complex)
    prop = np.zeros((l, l, 2, 2), complex)
    for a in k0:
        for b in k1:
            wil = MASS + 2 - np.cos(a) - np.cos(b)
            num = wil * np.eye(2) - 1j * (np.sin(a) * g0 + np.sin(b) * g1)
            den = wil ** 2 + np.sin(a) ** 2 + np.sin(b) ** 2
            phase = np.exp(1j * (a * np.arange(l)[:, None]
                                 + b * np.arange(l)[None, :]))
            prop += phase[..., None, None] * (num / den)
    prop /= l * l
    c_exact = (np.abs(prop) ** 2).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(c, c_exact, rtol=1e-3)


def test_pion_correlator_batched():
    theta = _rand_theta(jax.random.PRNGKey(20), batch=3)
    c = np.asarray(fermion.pion_correlator(theta, MASS, tol=1e-12))
    assert c.shape == (3, L)
    assert np.all(np.isfinite(c)) and np.all(c > 0)


# ------------------------------------------------------- even-odd precond

def _dense_even(theta, mass, op):
    """Dense matrix of an even-subspace operator, restricted to the even
    sites (rows/columns indexed by even-site components)."""
    m = _dense(theta, mass, op)
    mask = (np.asarray(fermion.parity_mask((L, L, 2), 0))
            * np.ones((L, L, 2))).reshape(-1) > 0
    keep = np.nonzero(mask)[0]
    return m[np.ix_(keep, keep)], keep


def test_dirac_hat_equals_schur_complement():
    """Dense Dhat restricted to even sites == A_ee - D_eo A_oo^{-1} D_oe
    built from the dense full operator."""
    theta = _rand_theta(jax.random.PRNGKey(30))
    d = _dense(theta, MASS, fermion.dirac)
    mask = (np.asarray(fermion.parity_mask((L, L, 2), 0))
            * np.ones((L, L, 2))).reshape(-1) > 0
    e, o = np.nonzero(mask)[0], np.nonzero(~mask)[0]
    schur = d[np.ix_(e, e)] - d[np.ix_(e, o)] @ np.linalg.solve(
        d[np.ix_(o, o)], d[np.ix_(o, e)])
    dhat, keep = _dense_even(theta, MASS, fermion.dirac_hat)
    assert np.array_equal(keep, e)
    np.testing.assert_allclose(dhat, schur, atol=1e-5)


def test_dirac_hat_determinant_identity():
    """det D = det(A_oo) * det(Dhat) = (m+2)^{n_odd} det(Dhat) — the
    preconditioned pseudofermion simulates the same theory."""
    theta = _rand_theta(jax.random.PRNGKey(31))
    d = _dense(theta, MASS, fermion.dirac)
    dhat, keep = _dense_even(theta, MASS, fermion.dirac_hat)
    n_odd = d.shape[0] - dhat.shape[0]
    s_full, ld_full = np.linalg.slogdet(d)
    s_hat, ld_hat = np.linalg.slogdet(dhat)
    ld_exp = ld_hat + n_odd * np.log(MASS + 2.0)
    np.testing.assert_allclose(ld_full, ld_exp, rtol=1e-5)


def test_eo_cg_converges_and_preserves_even_subspace():
    theta = _rand_theta(jax.random.PRNGKey(32), batch=2)
    phi, s0 = fermion.pf_refresh(jax.random.PRNGKey(33), theta, MASS,
                                 eo=True)
    # phi lives on even sites
    mo = 1.0 - np.asarray(fermion.parity_mask((L, L, 2), 0))
    assert np.abs(np.asarray(phi) * mo).max() < 1e-7
    res = fermion.cg_solve(theta, phi, MASS, tol=1e-12, maxiter=400, eo=True)
    assert float(res.rsq.max()) < 1e-11
    assert np.abs(np.asarray(res.x) * mo).max() < 1e-7
    s, _ = fermion.pf_action_exact(theta, phi, MASS, tol=1e-12, eo=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=1e-4)


def test_eo_fewer_cg_iterations():
    """The Schur system must converge in fewer iterations than the full
    system at equal tolerance (the point of the preconditioner)."""
    theta = _rand_theta(jax.random.PRNGKey(34))
    phi_f, _ = fermion.pf_refresh(jax.random.PRNGKey(35), theta, MASS)
    phi_e, _ = fermion.pf_refresh(jax.random.PRNGKey(35), theta, MASS,
                                  eo=True)
    it_f = int(fermion.cg_solve(theta, phi_f, MASS, tol=1e-10,
                                maxiter=2000).iters)
    it_e = int(fermion.cg_solve(theta, phi_e, MASS, tol=1e-10,
                                maxiter=2000, eo=True).iters)
    assert it_e < it_f, (it_e, it_f)


def test_eo_hmc_matches_plain_physics():
    """eo-preconditioned dynamical HMC: exp(-dH) ~ 1 and the plaquette
    matches the unpreconditioned sampler (same det(D)^2 theory)."""
    from fthmc_tpu.schwinger import SchwingerConfig, run_hmc_dyn
    import dataclasses as dc
    base = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5, nstep=8,
                           n_chains=8, ntraj=40, cg_tol_force=1e-10,
                           cg_tol_mh=1e-12, cg_maxiter=400)
    x0 = lattice.hot_start(jax.random.PRNGKey(36), 8, 4)
    _, h0 = run_hmc_dyn(base, x0=x0, key=jax.random.PRNGKey(37))
    _, h1 = run_hmc_dyn(dc.replace(base, eo_precond=True), x0=x0,
                        key=jax.random.PRNGKey(37))
    e1 = np.asarray(h1.exp_mdh).mean()
    assert abs(e1 - 1.0) < 0.1, e1
    p0 = np.asarray(h0.plaq)[20:].mean()
    p1 = np.asarray(h1.plaq)[20:].mean()
    assert abs(p0 - p1) < 0.03, (p0, p1)


# ---------------------------------------------------------------------------
# Exact dense log-determinant (round-4 fermion-aware smoothness target)

def test_logdet_mdagm_matches_complex_slogdet():
    """ln det(D^dag D) via the real representation == complex slogdet of
    the dense operator (batched)."""
    theta = _rand_theta(jax.random.PRNGKey(41), batch=3)
    ld = np.asarray(fermion.logdet_mdagm(theta, MASS))
    assert ld.shape == (3,)
    for b in range(3):
        d = _dense(theta[b], MASS, fermion.dirac).astype(np.complex128)
        _, ld_ref = np.linalg.slogdet(d.conj().T @ d)
        np.testing.assert_allclose(ld[b], ld_ref, rtol=2e-5)


def test_logdet_mdagm_gauge_invariant():
    theta = _rand_theta(jax.random.PRNGKey(42), batch=2)
    ld = fermion.logdet_mdagm(theta, MASS)
    theta_g = lattice.random_gauge_transform(jax.random.PRNGKey(7), theta)
    ld_g = fermion.logdet_mdagm(theta_g, MASS)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_g), rtol=2e-5)


def test_logdet_mdagm_gradient_matches_fd():
    theta = _rand_theta(jax.random.PRNGKey(43))

    def f(th):
        return jnp.sum(fermion.logdet_mdagm(th, MASS))

    g = np.asarray(jax.grad(f)(theta))
    v = np.array(jax.random.normal(jax.random.PRNGKey(8), theta.shape))
    v /= np.linalg.norm(v)
    eps = 1e-3
    fd = (float(f(theta + eps * v)) - float(f(theta - eps * v))) / (2 * eps)
    np.testing.assert_allclose(np.sum(g * v), fd, rtol=5e-3, atol=1e-4)


def test_ft_force_dyn_reduces_to_gauge_force_at_heavy_mass():
    """As m -> inf the fermion det force vanishes (hops suppressed by
    1/(m+2)), so the dynamical effective force -> the quenched one."""
    from fthmc_tpu.config import FlowSpec
    from fthmc_tpu.models.flow import init_flow_params
    from fthmc_tpu.hmc import ft_force
    from fthmc_tpu.train import ft_force_dyn
    spec = FlowSpec(n_layers=2, hidden_sizes=(4,), n_mixture=2)
    params = init_flow_params(jax.random.PRNGKey(0), spec)
    z = _rand_theta(jax.random.PRNGKey(44), batch=2)
    fg = np.asarray(ft_force(params, spec, z, 2.0))
    fd = np.asarray(ft_force_dyn(params, spec, z, 2.0, mass=1e4))
    np.testing.assert_allclose(fd, fg, rtol=1e-4, atol=5e-4)
    # ... and at a light mass it is genuinely different
    fl = np.asarray(ft_force_dyn(params, spec, z, 2.0, mass=0.1))
    assert np.max(np.abs(fl - fg)) > 1e-2


def test_train_step_fermaware_runs_and_updates():
    from fthmc_tpu.config import FlowSpec, TrainConfig
    from fthmc_tpu.train import init_train_state, train_step
    spec = FlowSpec(n_layers=2, hidden_sizes=(4,), n_mixture=2)
    cfg = TrainConfig(L=L, beta=2.0, batch_size=4, flow=spec,
                      force_weight=0.5, ferm_mass=0.1)
    state = init_train_state(jax.random.PRNGKey(1), cfg)
    new_state, metrics = train_step(
        state, spec, 4, L, 2.0, 1.0, 1e-3,
        force_weight=0.5, ferm_mass=0.1)
    assert np.isfinite(float(metrics["loss_dkl"]))
    assert np.isfinite(float(metrics["force_sq"]))
    leaves0 = jax.tree_util.tree_leaves(state.params)
    leaves1 = jax.tree_util.tree_leaves(new_state.params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


def test_train_era_threads_ferm_mass():
    """Regression: the fermion-aware term must actually change the era-scan
    training (a round-4 threading bug made --ferm-mass a silent no-op:
    train_era accepted the arg but dropped it at the internal step call —
    caught because the 'fermion-aware' run came out BIT-IDENTICAL to the
    pure-gauge control)."""
    from fthmc_tpu.config import FlowSpec, TrainConfig
    from fthmc_tpu.train import init_train_state, train_era
    spec = FlowSpec(n_layers=2, hidden_sizes=(4,), n_mixture=2)
    cfg = TrainConfig(L=L, beta=2.0, batch_size=4, flow=spec)
    state = init_train_state(jax.random.PRNGKey(1), cfg)
    _, m_gauge = train_era(state, spec, 4, L, 2.0, 1.0, 1e-3, 2,
                           force_weight=0.5)
    _, m_ferm = train_era(state, spec, 4, L, 2.0, 1.0, 1e-3, 2,
                          force_weight=0.5, ferm_mass=0.1)
    fg = np.asarray(m_gauge["force_sq"])
    ff = np.asarray(m_ferm["force_sq"])
    assert np.all(np.isfinite(ff))
    assert np.max(np.abs(fg - ff)) > 1e-6   # the term must bite
