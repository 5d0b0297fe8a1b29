"""Unit tests for L0 lattice ops (SURVEY.md section 4 test plan)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu import lattice

PI = math.pi


def test_plaq_phase_hand_computed_2x2():
    # 2x2 lattice, hand-set links
    x = np.zeros((2, 2, 2), np.float32)
    x[0, 0, 0] = 0.3   # theta_0(0,0)
    x[1, 1, 0] = 0.5   # theta_1(1,0)
    x[0, 0, 1] = -0.2  # theta_0(0,1)
    x[1, 0, 0] = 0.1   # theta_1(0,0)
    p = np.asarray(lattice.plaq_phase(jnp.asarray(x)))
    # P(0,0) = t0(0,0) + t1(1,0) - t0(0,1) - t1(0,0)
    assert np.isclose(p[0, 0], 0.3 + 0.5 - (-0.2) - 0.1, atol=1e-6)
    # P is sum over each plaquette of its 4 links with signs; on a 2-torus
    # every link appears in exactly 2 plaquettes with opposite signs:
    assert np.isclose(p.sum(), 0.0, atol=1e-6)


def test_action_matches_definition(x_batch):
    beta = 2.0
    s = lattice.batch_action(x_batch, beta)
    expect = -beta * jnp.sum(jnp.cos(lattice.batch_plaqs(x_batch)),
                             axis=(1, 2))
    np.testing.assert_allclose(np.asarray(s), np.asarray(expect), rtol=1e-6)


def test_analytic_force_matches_autograd(x_batch):
    beta = 2.7
    f = lattice.batch_force(x_batch, beta)
    g = jax.vmap(lambda y: lattice.grad_force(y, beta))(x_batch)
    np.testing.assert_allclose(np.asarray(f), np.asarray(g),
                               atol=2e-5, rtol=1e-4)


def test_delta_action_consistency(x_batch):
    beta = 2.0
    x0 = x_batch
    x1 = x_batch + 0.01 * jnp.ones_like(x_batch)
    d = jax.vmap(lambda a, b: lattice.delta_action(a, b, beta))(x1, x0)
    full = lattice.batch_action(x1, beta) - lattice.batch_action(x0, beta)
    np.testing.assert_allclose(np.asarray(d), np.asarray(full),
                               atol=1e-3, rtol=1e-4)


def test_topo_charge_integer(x_batch):
    q = np.asarray(lattice.batch_charges(x_batch))
    np.testing.assert_allclose(q, np.round(q), atol=1e-4)


def test_gauge_invariance_of_plaq_and_charge(x_batch):
    key = jax.random.PRNGKey(11)
    xg = lattice.random_gauge_transform(key, x_batch)
    p0 = np.asarray(lattice.batch_plaq_mean(x_batch))
    p1 = np.asarray(lattice.batch_plaq_mean(xg))
    np.testing.assert_allclose(p0, p1, atol=1e-5)
    q0 = np.asarray(lattice.batch_charges(x_batch))
    q1 = np.asarray(lattice.batch_charges(xg))
    np.testing.assert_allclose(q0, q1, atol=1e-3)


def test_wrap_range():
    x = jnp.asarray([-7.0, -PI, -1.0, 0.0, 1.0, PI, 7.0, 100.0])
    w = np.asarray(lattice.wrap(x))
    assert np.all(w > -PI - 1e-6) and np.all(w <= PI + 1e-6)
    # wrap preserves the angle mod 2pi
    np.testing.assert_allclose(np.cos(w), np.cos(np.asarray(x)), atol=1e-5)


def test_wilson_loop_1x1_is_plaq(x_batch):
    w11 = np.asarray(lattice.batch_wilson_loops(x_batch, 1, 1))
    pm = np.asarray(lattice.batch_plaq_mean(x_batch))
    np.testing.assert_allclose(w11, pm, atol=1e-6)


def test_wilson_loop_gauge_invariant(x_batch):
    key = jax.random.PRNGKey(21)
    xg = lattice.random_gauge_transform(key, x_batch)
    w = np.asarray(lattice.batch_wilson_loops(x_batch, 2, 3))
    wg = np.asarray(lattice.batch_wilson_loops(xg, 2, 3))
    np.testing.assert_allclose(w, wg, atol=1e-4)


def test_wilson_loop_area_law():
    """In 2D U(1), <W(R,T)> = (I1(b)/I0(b))^(R*T) exactly on the infinite
    lattice; check on an equilibrated ensemble within loose stat errors."""
    from fthmc_tpu.config import HMCConfig
    from fthmc_tpu.hmc import run_hmc
    cfg = HMCConfig(beta=2.0, L=8, tau=2.0, nstep=10, ntraj=300,
                    n_chains=32, randinit=True, seed=13)
    x, _ = run_hmc(cfg)
    w22 = float(np.mean(np.asarray(lattice.batch_wilson_loops(x, 2, 2))))
    expect = lattice.PLAQ_EXACT[2.0] ** 4
    assert abs(w22 - expect) < 0.05


@pytest.mark.parametrize("beta", [1.0, 2.0])
def test_plaq_exact_table_sanity(beta):
    # the stored exact values are I1(beta)/I0(beta)
    from scipy import special  # scipy is available in the image
    expect = special.iv(1, beta) / special.iv(0, beta)
    assert abs(lattice.PLAQ_EXACT[beta] - expect) < 1e-6


def test_polyakov_loop_gauge_invariant(x_batch):
    key = jax.random.PRNGKey(21)
    p0 = np.asarray(lattice.batch_polyakov_loops(x_batch))
    p1 = np.asarray(lattice.batch_polyakov_loops(
        lattice.random_gauge_transform(key, x_batch)))
    np.testing.assert_allclose(p0, p1, atol=1e-4)
    # winding the other cycle is also gauge invariant
    p2 = np.asarray(lattice.batch_polyakov_loops(x_batch, mu=1))
    p3 = np.asarray(lattice.batch_polyakov_loops(
        lattice.random_gauge_transform(key, x_batch), mu=1))
    np.testing.assert_allclose(p2, p3, atol=1e-4)


def test_polyakov_cold_start_is_one():
    x = lattice.cold_start(8)[None]
    p = np.asarray(lattice.batch_polyakov_loops(x))
    assert p.shape == (1, 2)  # packed [Re, Im] per chain (real, TPU-safe)
    np.testing.assert_allclose(p, [[1.0, 0.0]], atol=1e-6)


@pytest.mark.slow
def test_creutz_ratio_matches_exact_string_tension():
    """chi(R,T) = -log(I1/I0) for all R,T in 2D U(1) (exact area law)."""
    from fthmc_tpu.config import HMCConfig
    from fthmc_tpu.hmc import run_hmc
    from fthmc_tpu.observables import creutz_ratio, string_tension_exact
    cfg = HMCConfig(beta=2.0, L=8, tau=2.0, nstep=10, ntraj=400,
                    n_chains=32, randinit=True, seed=17)
    x, _ = run_hmc(cfg)
    W = np.ones((3, 3))
    for R in range(1, 3):
        for T in range(1, 3):
            W[R, T] = float(np.mean(np.asarray(
                lattice.batch_wilson_loops(x, R, T))))
    sigma = string_tension_exact(2.0)
    for (R, T) in [(1, 1), (2, 1), (1, 2), (2, 2)]:
        assert abs(creutz_ratio(W, R, T) - sigma) < 0.1, (R, T)
