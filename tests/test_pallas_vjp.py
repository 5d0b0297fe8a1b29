"""Fused coupling-layer VJP kernels vs XLA autodiff (interpret mode, CPU).

The backward kernel must reproduce jax.vjp of the XLA coupling layer
(models/coupling.py) including the value-path hard clip, the logJ
stop_gradient(|s|) factoring, and the s_clip smooth cap. The decisive
check runs in float64, where the kernels match XLA to ~1e-13 (the math is
EXACT; fp32 differences are accumulation-order roundoff through the conv
chain, measured ~3e-4 relative, and are bounded loosely here)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu.config import FlowSpec
from fthmc_tpu.hmc import ft_force, resolve_force_backend
from fthmc_tpu.models.coupling import CouplingOut, link_coupling_forward
from fthmc_tpu.models.flow import init_flow_params
from fthmc_tpu.ops.pallas_coupling_vjp import (ft_force_pallas,
                                               pallas_link_coupling_bwd,
                                               pallas_link_coupling_fwd_res,
                                               vjp_kernel_fits)

PI = math.pi


def _layer_case(spec, dtype, B=16, L=8, mu=1, off=2, seed=7):
    params = init_flow_params(jax.random.PRNGKey(5), spec)
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.uniform(k1, (B, 2, L, L), dtype, -PI, PI)
    gy = jax.random.normal(k2, x.shape, dtype)
    gl = jax.random.normal(k3, (B,), dtype)

    out, vjp = jax.vjp(
        lambda xx: link_coupling_forward(params[0], xx, mu, off, spec), x)
    (gx_ref,) = vjp(CouplingOut(x=gy, logJ=gl))

    xc = jnp.transpose(x, (1, 2, 3, 0))
    fxc, lj, res = pallas_link_coupling_fwd_res(params[0], xc, mu, off,
                                                spec, interpret=True)
    gxc = pallas_link_coupling_bwd(params[0], xc, res,
                                   jnp.transpose(gy, (1, 2, 3, 0)), gl,
                                   mu, off, spec, interpret=True)
    fx = jnp.transpose(fxc, (3, 0, 1, 2))
    gx = jnp.transpose(gxc, (3, 0, 1, 2))
    return out, lj, fx, gx, gx_ref


@pytest.mark.parametrize("coupling,M,s_clip", [
    ("ncp", 2, None), ("rncp", 4, 3.0),
])
def test_layer_vjp_exact_in_float64(coupling, M, s_clip):
    """The decisive math-parity check: in fp64 the kernels match jax.vjp of
    the XLA layer to roundoff."""
    spec = FlowSpec(n_layers=1, coupling=coupling, n_mixture=M,
                    hidden_sizes=(8, 8), s_clip=s_clip)
    with jax.enable_x64():
        out, lj, fx, gx, gx_ref = _layer_case(spec, jnp.float64)
        # value path goes through the kernel's polynomial atan
        # (pallas_coupling._atan, truncation ~3e-11); logJ and the
        # gradients are rational/exp-only and match to fp64 roundoff.
        assert np.abs(np.asarray(fx - out.x)).max() < 1e-9
        assert np.abs(np.asarray(lj - out.logJ)).max() < 1e-11
        assert np.abs(np.asarray(gx - gx_ref)).max() < 1e-11


@pytest.mark.parametrize("coupling,M,s_clip", [
    ("ncp", 6, 3.0), ("rncp", 8, None),
])
def test_layer_vjp_float32(coupling, M, s_clip):
    """fp32 run of the same comparison: bounded by accumulation-order
    roundoff (~1e-3 relative through an 8-channel conv chain)."""
    spec = FlowSpec(n_layers=1, coupling=coupling, n_mixture=M,
                    hidden_sizes=(8, 8), s_clip=s_clip)
    out, lj, fx, gx, gx_ref = _layer_case(spec, jnp.float32, B=128)
    dy = np.max(np.abs(np.asarray(
        jnp.remainder(fx - out.x + PI, 2 * PI) - PI)))
    assert dy < 1e-5
    np.testing.assert_allclose(np.asarray(lj), np.asarray(out.logJ),
                               atol=1e-4)
    ref = np.asarray(gx_ref)
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(gx), ref, atol=2e-3 * scale)


def test_ft_force_pallas_matches_xla():
    """End-to-end force through a 4-layer flow (fp32, loose bound; the
    per-layer fp64 test above pins the math)."""
    spec = FlowSpec(n_layers=4, coupling="rncp", n_mixture=4,
                    hidden_sizes=(8,), s_clip=3.0)
    params = init_flow_params(jax.random.PRNGKey(0), spec)
    z = jax.random.uniform(jax.random.PRNGKey(1), (64, 2, 8, 8),
                           jnp.float32, -PI, PI)
    beta = 2.0
    f_ref = np.asarray(ft_force(params, spec, z, beta))
    f_pal = np.asarray(ft_force_pallas(params, spec, z, beta,
                                       interpret=True))
    scale = max(1.0, np.abs(f_ref).max())
    np.testing.assert_allclose(f_pal, f_ref, atol=2e-3 * scale)


def test_vjp_kernel_fits_gating():
    small = FlowSpec(n_layers=1, n_mixture=6, hidden_sizes=(8, 8))
    assert vjp_kernel_fits(small, L=16, B=128)
    wide = FlowSpec(n_layers=1, n_mixture=8, hidden_sizes=(64, 64))
    assert not vjp_kernel_fits(wide, L=64, B=128)
    spline = FlowSpec(n_layers=1, coupling="spline")
    assert not vjp_kernel_fits(spline, L=8, B=128)
    # VMEM envelope: Mosaic stack OOM beyond (L <= 8 or B <= 128)
    assert not vjp_kernel_fits(small, L=16, B=1024)
    assert vjp_kernel_fits(small, L=8, B=1024)
    # dispatcher: 'auto' is XLA (measured faster end-to-end on v5e -
    # BENCH.md); 'pallas' is an explicit opt-in
    assert resolve_force_backend("auto", small, (64, 2, 16, 16),
                                 jnp.float32) == "xla"
    assert resolve_force_backend("pallas", small, (64, 2, 16, 16),
                                 jnp.float32) == "pallas"
