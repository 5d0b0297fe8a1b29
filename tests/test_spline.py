"""Circular rational-quadratic spline coupling tests (models/spline.py).

Mirrors the NCP coupling test battery (test_coupling.py): transform math,
Jacobians, analytic inverse, full-flow round trip, identity init, and
FT-HMC exactness with a spline flow.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu.config import FlowSpec
from fthmc_tpu.models import coupling as C
from fthmc_tpu.models.flow import (flow_forward, flow_out_channels,
                                   flow_reverse, init_flow_params)
from fthmc_tpu.models.spline import spline_forward, spline_inverse

PI = math.pi
K = 6


@pytest.fixture(scope="module")
def sspec() -> FlowSpec:
    return FlowSpec(n_layers=2, coupling="spline", n_knots=K,
                    hidden_sizes=(4,), kernel_size=3)


@pytest.fixture(scope="module")
def sparams(sspec):
    return init_flow_params(jax.random.PRNGKey(5), sspec)


@pytest.fixture(scope="module")
def raw_batch():
    return 0.8 * jax.random.normal(jax.random.PRNGKey(1), (3, 3 * K, 8, 8))


@pytest.fixture(scope="module")
def ang_batch():
    return jax.random.uniform(jax.random.PRNGKey(2), (3, 8, 8),
                              jnp.float32, -PI, PI)


def test_out_channels(sspec):
    assert flow_out_channels(sspec) == 3 * K + 1
    assert flow_out_channels(FlowSpec(n_mixture=4)) == 5


def test_identity_at_zero_raw(ang_batch):
    raw0 = jnp.zeros((3, 3 * K, 8, 8))
    y, lj = spline_forward(ang_batch, raw0, K)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ang_batch),
                               atol=1e-5)
    assert float(jnp.max(jnp.abs(lj))) < 1e-4


def test_monotone_and_range(raw_batch):
    xs = jnp.broadcast_to(
        jnp.linspace(-PI, PI - 1e-4, 201)[None, :, None], (3, 201, 1))
    raws = jnp.broadcast_to(raw_batch[:, :, :1, :1], (3, 3 * K, 201, 1))
    ys, _ = spline_forward(xs, raws, K)
    d = np.diff(np.asarray(ys), axis=1)
    assert np.all(d > -1e-6)
    assert np.max(np.abs(np.asarray(ys))) <= PI + 1e-5


def test_analytic_inverse_roundtrip(ang_batch, raw_batch):
    y, lj = spline_forward(ang_batch, raw_batch, K)
    x2, lj2 = spline_inverse(y, raw_batch, K)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(ang_batch),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(lj), np.asarray(lj2), atol=1e-4)


def test_logJ_matches_numeric_derivative(ang_batch, raw_batch):
    h = 1e-3
    yp, _ = spline_forward(ang_batch + h, raw_batch, K)
    ym, _ = spline_forward(ang_batch - h, raw_batch, K)
    # central difference crosses the wrap seam / bin boundaries at a few
    # sites; compare where the difference stays local
    num = np.asarray((yp - ym) / (2 * h))
    ana = np.exp(np.asarray(spline_forward(ang_batch, raw_batch, K)[1]))
    ok = np.abs(num - ana) < 5e-2 * np.maximum(ana, 1.0)
    assert ok.mean() > 0.98


def test_wrap_invariance(ang_batch, raw_batch):
    """Plaquette angles live outside [-pi,pi): the transform must be
    2pi-periodic in its input (value and logJ)."""
    y1, lj1 = spline_forward(ang_batch, raw_batch, K)
    y2, lj2 = spline_forward(ang_batch + 2 * PI, raw_batch, K)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lj1), np.asarray(lj2), atol=1e-4)


def test_grads_finite(ang_batch, raw_batch):
    g = jax.grad(lambda r: jnp.sum(spline_forward(ang_batch, r, K)[0])
                 + jnp.sum(spline_forward(ang_batch, r, K)[1]))(raw_batch)
    assert np.all(np.isfinite(np.asarray(g)))
    gx = jax.grad(
        lambda x: jnp.sum(spline_forward(x, raw_batch, K)[1]))(ang_batch)
    assert np.all(np.isfinite(np.asarray(gx)))


def test_link_coupling_roundtrip_and_logdet(sparams, sspec, x_batch):
    net = sparams[0]
    y, logJ = C.link_coupling_forward(net, x_batch, 0, 0, sspec)
    x2, logJr = C.link_coupling_reverse(net, y, 0, 0, sspec)
    err = np.max(np.abs(np.asarray(C.wrap_pi(x2 - x_batch))))
    assert err < 5e-4
    np.testing.assert_allclose(np.asarray(logJ), -np.asarray(logJr),
                               atol=5e-4)


def test_logdet_matches_autodiff_jacobian(sspec, sparams):
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 4, 4),
                           jnp.float32, -3.0, 3.0)
    net = sparams[0]
    f = lambda xx: C.link_coupling_forward(net, xx[None], 0, 1, sspec).x[0]
    J = jax.jacfwd(f)(x[0]).reshape(32, 32)
    sign, ladet = np.linalg.slogdet(np.asarray(J, np.float64))
    _, logJ = C.link_coupling_forward(net, x, 0, 1, sspec)
    assert sign > 0
    np.testing.assert_allclose(float(logJ[0]), ladet, atol=1e-3)


def test_full_flow_roundtrip(sparams, sspec, x_batch):
    y, logdet = flow_forward(sparams, x_batch, sspec)
    x2, logdet_rev = flow_reverse(sparams, y, sspec)
    err = np.max(np.abs(np.asarray(C.wrap_pi(x2 - x_batch))))
    assert err < 1e-3
    np.testing.assert_allclose(np.asarray(logdet), -np.asarray(logdet_rev),
                               atol=2e-3)


def test_fthmc_exact_with_spline_flow(sparams, sspec):
    """<exp(-dH)> = 1 must hold for ANY invertible flow, trained or not -
    run a short FT-HMC chain with a random spline flow at 8^2 beta=1."""
    from fthmc_tpu.hmc import run_fthmc
    from fthmc_tpu.config import LeapfrogConfig

    z0 = jnp.zeros((16, 2, 8, 8), jnp.float32)
    lf = LeapfrogConfig(tau=0.5, nstep=10)
    _, hist = run_fthmc(sparams, sspec, lf, beta=1.0, ntraj=40,
                        z0=z0, key=jax.random.PRNGKey(3))
    exp_mdh = np.asarray(hist.exp_mdh)[10:]
    assert abs(exp_mdh.mean() - 1.0) < 5 * exp_mdh.std() / math.sqrt(
        exp_mdh.size) + 0.05
    assert np.asarray(hist.acc)[10:].mean() > 0.5
