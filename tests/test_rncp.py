"""Rotated-mixture NCP ("rncp") coupling tests.

The smooth high-capacity family for beta >= 3 (coupling.py rncp_*): mean of
NCP transforms with per-component learned rotations. Key invariants: exact
reduction to plain NCP at r=0, monotonicity, round-trip through the lifted
bisection inverse, logdet == autodiff Jacobian, smooth force (the property
the C^1 spline lacks).
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

PI = math.pi
M = 4


@pytest.fixture(scope="module")
def rspec() -> FlowSpec:
    return FlowSpec(n_layers=2, coupling="rncp", n_mixture=M,
                    hidden_sizes=(4,), kernel_size=3)


@pytest.fixture(scope="module")
def rparams(rspec):
    return init_flow_params(jax.random.PRNGKey(5), rspec)


def test_out_channels(rspec):
    assert flow_out_channels(rspec) == 2 * M + 1


def test_reduces_to_ncp_at_zero_rotation(rparams, rspec, x_batch):
    """Zeroing the rotation channels must reproduce the plain NCP layer with
    the same s/t weights exactly."""
    spec_ncp = FlowSpec(n_layers=2, n_mixture=M, hidden_sizes=(4,))
    p_r0, p_ncp = [], []
    for net in rparams:
        net2 = [dict(p) for p in net]
        w, b = net2[-1]["w"], net2[-1]["b"]
        net2[-1] = {"w": w.at[M:2 * M].set(0.0), "b": b.at[M:2 * M].set(0.0)}
        p_r0.append(net2)
        net3 = [dict(p) for p in net]
        net3[-1] = {
            "w": jnp.concatenate([w[:M], w[2 * M:2 * M + 1]], axis=0),
            "b": jnp.concatenate([b[:M], b[2 * M:2 * M + 1]], axis=0)}
        p_ncp.append(net3)
    y0, ld0 = flow_forward(p_r0, x_batch, rspec)
    y1, ld1 = flow_forward(p_ncp, x_batch, spec_ncp)
    np.testing.assert_allclose(np.asarray(C.wrap_pi(y0 - y1)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld0), np.asarray(ld1), atol=1e-4)


def test_monotone_with_rotations():
    xs = jnp.linspace(-PI + 1e-4, PI - 1e-4, 401)[None, None, :, None]
    s = jnp.asarray([1.5, -0.5, 2.0, 0.3])[None, :, None, None]
    r = jnp.asarray([0.0, 1.2, -2.5, 3.0])[None, :, None, None]
    xs_b = jnp.broadcast_to(xs, (1, 1, 401, 1))
    s_b = jnp.broadcast_to(s, (1, 4, 401, 1))
    r_b = jnp.broadcast_to(r, (1, 4, 401, 1))
    y = C.rotated_mixture_transform(xs_b, s_b, r_b)
    d = np.diff(np.asarray(y)[0, :, 0])
    assert np.all(d > 0)
    # winding 1: f(pi) - f(-pi) = 2pi
    lo = C.rotated_mixture_transform(
        jnp.full_like(xs_b, -PI + 1e-6), s_b, r_b)
    hi = C.rotated_mixture_transform(
        jnp.full_like(xs_b, PI - 1e-6), s_b, r_b)
    np.testing.assert_allclose(np.asarray(hi - lo), 2 * PI, atol=1e-3)


def test_logJ_matches_numeric_derivative():
    x = jnp.linspace(-2.8, 2.8, 29)[None, None, :, None]
    x = jnp.broadcast_to(x, (1, 1, 29, 1))
    s = jnp.broadcast_to(
        jnp.asarray([0.8, -1.2])[None, :, None, None], (1, 2, 29, 1))
    r = jnp.broadcast_to(
        jnp.asarray([0.5, -1.0])[None, :, None, None], (1, 2, 29, 1))
    h = 1e-3
    num = (np.asarray(C.rotated_mixture_transform(x + h, s, r))
           - np.asarray(C.rotated_mixture_transform(x - h, s, r))) / (2 * h)
    ana = np.exp(np.asarray(C.rotated_mixture_logJ(x, s, r)))
    np.testing.assert_allclose(ana[0, :, 0], num[0, :, 0], rtol=5e-3,
                               atol=5e-3)


def test_link_coupling_roundtrip_and_logdet(rparams, rspec, x_batch):
    net = rparams[0]
    y, logJ = C.link_coupling_forward(net, x_batch, 0, 0, rspec)
    x2, logJr = C.link_coupling_reverse(net, y, 0, 0, rspec)
    err = np.max(np.abs(np.asarray(C.wrap_pi(x2 - x_batch))))
    assert err < 5e-5
    np.testing.assert_allclose(np.asarray(logJ), -np.asarray(logJr),
                               atol=5e-4)


def test_logdet_matches_autodiff_jacobian(rspec, rparams):
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 4, 4),
                           jnp.float32, -3.0, 3.0)
    net = rparams[0]
    f = lambda xx: C.link_coupling_forward(net, xx[None], 0, 1, rspec).x[0]
    J = jax.jacfwd(f)(x[0]).reshape(32, 32)
    sign, ladet = np.linalg.slogdet(np.asarray(J, np.float64))
    _, logJ = C.link_coupling_forward(net, x, 0, 1, rspec)
    assert sign > 0
    np.testing.assert_allclose(float(logJ[0]), ladet, atol=1e-3)


def test_full_flow_roundtrip(rparams, rspec, x_batch):
    y, logdet = flow_forward(rparams, x_batch, rspec)
    x2, logdet_rev = flow_reverse(rparams, y, rspec)
    err = np.max(np.abs(np.asarray(C.wrap_pi(x2 - x_batch))))
    assert err < 1e-4
    np.testing.assert_allclose(np.asarray(logdet), -np.asarray(logdet_rev),
                               atol=2e-3)


def test_force_is_smooth():
    """The rncp force must be continuous in z (finite second differences) -
    the property whose absence kills the spline for leapfrog."""
    from fthmc_tpu.hmc import ft_force
    spec = FlowSpec(n_layers=1, coupling="rncp", n_mixture=4,
                    hidden_sizes=(4,))
    params = init_flow_params(jax.random.PRNGKey(2), spec)
    z = jax.random.uniform(jax.random.PRNGKey(3), (1, 2, 8, 8),
                           jnp.float32, -PI, PI)
    eps = 1e-3
    dz = jnp.zeros_like(z).at[0, 0, 3, 3].set(1.0)
    f0 = ft_force(params, spec, z - eps * dz, 2.0)
    f1 = ft_force(params, spec, z, 2.0)
    f2 = ft_force(params, spec, z + eps * dz, 2.0)
    second = np.asarray((f2 - 2 * f1 + f0) / eps**2)
    # smooth transform: bounded second difference (spline kinks blow this up)
    assert np.max(np.abs(second)) < 1e3
