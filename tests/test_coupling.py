"""NCP coupling-layer tests: transform math, Jacobians, inverses, stability."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu.models import coupling as C

PI = math.pi


def test_tan_transform_identity_at_s0():
    x = jnp.linspace(-3.0, 3.0, 41)
    y = C.tan_transform(x, jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_tan_transform_monotone_and_range():
    x = jnp.linspace(-PI + 1e-3, PI - 1e-3, 201)
    for s in (-2.0, -0.5, 0.7, 3.0):
        y = np.asarray(C.tan_transform(x, jnp.full_like(x, s)))
        assert np.all(np.diff(y) > 0)
        assert np.all(np.abs(y) <= PI + 1e-5)


def test_logJ_matches_numeric_derivative():
    x = jnp.linspace(-2.5, 2.5, 21)
    s = jnp.full_like(x, 0.8)
    h = 1e-3
    num = (np.asarray(C.tan_transform(x + h, s))
           - np.asarray(C.tan_transform(x - h, s))) / (2 * h)
    ana = np.exp(np.asarray(C.tan_transform_logJ(x, s)))
    np.testing.assert_allclose(ana, num, rtol=5e-3, atol=5e-3)


def test_transform_stable_at_extreme_s():
    """Reference formula produces inf*0=NaN at masked x=0 when e^s overflows
    (verified against the reference in torch); ours must stay finite with
    finite gradients."""
    x = jnp.asarray([0.0, 1e-6, 1.0, PI - 1e-6])
    for s in (-500.0, -100.0, 100.0, 500.0, 4e4):
        sv = jnp.full_like(x, s)
        y = np.asarray(C.tan_transform(x, sv))
        lj = np.asarray(C.tan_transform_logJ(x, sv))
        assert np.all(np.isfinite(y)), (s, y)
        assert np.all(np.isfinite(lj)), (s, lj)
        g = np.asarray(jax.grad(
            lambda ss: jnp.sum(C.tan_transform_logJ(x, ss)))(sv))
        assert np.all(np.isfinite(g)), (s, g)
        # logJ slope in s approaches -+1 asymptotically (not clipped to 0)
        if abs(s) >= 100:
            assert abs(abs(g[2]) - 1.0) < 1e-3


def test_logJ_grad_wrt_x_finite_at_masked_zero():
    x = jnp.zeros((4,))
    s = jnp.asarray([-200.0, -1.0, 1.0, 200.0])
    g = np.asarray(jax.grad(
        lambda xx: jnp.sum(C.tan_transform_logJ(xx, s)))(x))
    assert np.all(np.isfinite(g))


def test_link_coupling_roundtrip_and_logdet(params2, spec2, x_batch):
    net = params2[0]
    y, logJ = C.link_coupling_forward(net, x_batch, 0, 0, spec2)
    x2, logJr = C.link_coupling_reverse(net, y, 0, 0, spec2)
    err = np.max(np.abs(np.asarray(C.wrap_pi(x2 - x_batch))))
    assert err < 5e-5
    np.testing.assert_allclose(np.asarray(logJ), -np.asarray(logJr),
                               atol=5e-4)


def test_coupling_only_touches_active_links(params2, spec2, x_batch):
    from fthmc_tpu.models.masks import link_active_stripes
    net = params2[0]
    mu, off = 1, 2
    y, _ = C.link_coupling_forward(net, x_batch, mu, off, spec2)
    mask = link_active_stripes((2, 8, 8), mu, off)
    diff = np.asarray(jnp.abs(C.wrap_pi(y - x_batch)))
    assert np.max(diff * (1 - mask)) == 0.0
    assert np.max(diff * mask) > 1e-4  # something actually moved


def test_logdet_matches_autodiff_jacobian(spec2, params2):
    """Brute-force check: logdet from the layer equals log|det| of the full
    autodiff Jacobian of the link map on a tiny 4x4 lattice."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 4, 4),
                           jnp.float32, -3.0, 3.0)
    net = params2[0]
    f = lambda xx: C.link_coupling_forward(net, xx[None], 0, 1, spec2).x[0]
    J = jax.jacfwd(f)(x[0]).reshape(32, 32)
    sign, ladet = np.linalg.slogdet(np.asarray(J, np.float64))
    _, logJ = C.link_coupling_forward(net, x, 0, 1, spec2)
    assert sign > 0
    np.testing.assert_allclose(float(logJ[0]), ladet, atol=1e-3)


def test_dense_circulant_equals_conv():
    from fthmc_tpu.ops.conv import circular_conv2d, circular_conv2d_dense
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 2, 3, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (8,))
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 2, 8, 8), jnp.float32)
    y1 = circular_conv2d(x, w, b)
    y2 = circular_conv2d_dense(x, w, b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    g1 = jax.grad(lambda ww: jnp.sum(jnp.sin(circular_conv2d(x, ww, b))))(w)
    g2 = jax.grad(
        lambda ww: jnp.sum(jnp.sin(circular_conv2d_dense(x, ww, b))))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
