"""Validation for FlowSpec.conv_dtype='bfloat16' and FlowSpec.s_clip.

Round-1 verdict: both flags existed untested. The key exactness fact: FT-HMC
<exp(-dH)> = 1 holds for ANY invertible map - bf16 convs change WHICH flow
is applied, not detailed balance - so the bf16 path must still pass the
exactness test while producing (slightly) different fields than fp32.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu.config import FlowSpec, LeapfrogConfig
from fthmc_tpu.models import coupling as C
from fthmc_tpu.models.flow import flow_forward, flow_reverse, init_flow_params

PI = math.pi


@pytest.fixture(scope="module")
def bf16_spec():
    return FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,),
                    conv_dtype="bfloat16")


def test_bf16_flow_close_to_fp32(spec2, params2, x_batch):
    bspec = FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,),
                     kernel_size=3, conv_dtype="bfloat16")
    y32, ld32 = flow_forward(params2, x_batch, spec2)
    y16, ld16 = flow_forward(params2, x_batch, bspec)
    assert y16.dtype == jnp.float32  # compute bf16, results fp32
    # bf16 has ~3 decimal digits; the flow output must track fp32 loosely
    assert float(jnp.max(jnp.abs(C.wrap_pi(y16 - y32)))) < 0.05
    assert float(jnp.max(jnp.abs(ld16 - ld32))) < 0.5


def test_bf16_flow_roundtrip(params2, bf16_spec, x_batch):
    """Invertibility must hold exactly for the bf16 flow itself (forward and
    reverse run the SAME bf16 conv -> same s, t -> exact inverse)."""
    y, ld = flow_forward(params2, x_batch, bf16_spec)
    x2, ldr = flow_reverse(params2, y, bf16_spec)
    err = np.max(np.abs(np.asarray(C.wrap_pi(x2 - x_batch))))
    assert err < 5e-4
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ldr), atol=5e-3)


def test_bf16_fthmc_exactness(params2, bf16_spec):
    """<exp(-dH)> = 1 with the bf16-conv flow (the production gate named in
    config.py's conv_dtype docstring)."""
    from fthmc_tpu.hmc import run_fthmc
    z0 = jnp.zeros((16, 2, 8, 8), jnp.float32)
    lf = LeapfrogConfig(tau=0.5, nstep=8)
    _, hist = run_fthmc(params2, bf16_spec, lf, beta=1.5, ntraj=48,
                        z0=z0, key=jax.random.PRNGKey(9))
    em = np.asarray(hist.exp_mdh)[12:]
    assert np.all(np.isfinite(em))
    assert abs(em.mean() - 1.0) < 0.1
    assert np.asarray(hist.acc)[12:].mean() > 0.3


def test_bf16_grads_finite(params2, bf16_spec):
    from fthmc_tpu.hmc import ft_force
    z = jax.random.uniform(jax.random.PRNGKey(0), (4, 2, 8, 8),
                           jnp.float32, -PI, PI)
    f = ft_force(params2, bf16_spec, z, 2.0)
    assert np.all(np.isfinite(np.asarray(f)))


# ---------------------------------------------------------------------------
# s_clip: the FT-HMC integrability knob
# ---------------------------------------------------------------------------

def test_s_clip_bounds_ncp_transform_slope():
    """With s_clip=c the NCP transform derivative is bounded in
    [e^-c, e^c] whatever the CNN emits: s passes through c*tanh(s/c)."""
    c = 1.5
    spec = FlowSpec(n_layers=1, n_mixture=2, hidden_sizes=(4,), s_clip=c)
    params = init_flow_params(jax.random.PRNGKey(0), spec)
    # blow up the final conv weights so raw |s| >> c
    params[0][-1] = {"w": 50.0 + 0 * params[0][-1]["w"],
                     "b": 50.0 + 0 * params[0][-1]["b"]}
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 2, 8, 8),
                           jnp.float32, -PI, PI)
    plaq = C._plaq_of_links(x)
    from fthmc_tpu.models.masks import plaq_masks
    frozen, active, passive = (jnp.asarray(m, jnp.float32)
                               for m in plaq_masks((8, 8), 0, 0))
    s, t = C._net_s_t(params[0], frozen, plaq, spec)
    assert float(jnp.max(jnp.abs(s))) <= c + 1e-5
    out = C.plaq_coupling_forward(params[0], plaq, 0, 0, spec)
    # per-site logJ bounded by the slope cap
    n_active = float(jnp.sum(active))
    assert float(jnp.max(jnp.abs(out.logJ))) <= c * n_active + 1e-3


def test_s_clip_bounds_spline_logits():
    c = 1.0
    K = 6
    spec = FlowSpec(n_layers=1, coupling="spline", n_knots=K,
                    hidden_sizes=(4,), s_clip=c)
    params = init_flow_params(jax.random.PRNGKey(0), spec)
    params[0][-1] = {"w": 50.0 + 0 * params[0][-1]["w"],
                     "b": 50.0 + 0 * params[0][-1]["b"]}
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 2, 8, 8),
                           jnp.float32, -PI, PI)
    plaq = C._plaq_of_links(x)
    from fthmc_tpu.models.masks import plaq_masks
    frozen = jnp.asarray(plaq_masks((8, 8), 0, 0)[0], jnp.float32)
    raw, t = C._net_spline_raw(params[0], frozen, plaq, spec)
    assert float(jnp.max(jnp.abs(raw))) <= c + 1e-5
    # slope cap: width/height logits in [-c, c] => bin aspect <= e^{2c};
    # with the derivative logits also clipped the pointwise log-slope is
    # O(2c + log softplus(c)); check the measured logJ respects a generous
    # closed-form bound
    from fthmc_tpu.models.spline import spline_forward
    y, lj = spline_forward(plaq, raw, K)
    assert float(jnp.max(jnp.abs(lj))) < 2 * c + 3.0


def test_s_clip_noop_when_small():
    """s_clip must leave a well-behaved flow essentially unchanged
    (c*tanh(s/c) ~ s for |s| << c)."""
    spec_off = FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,))
    spec_on = FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,),
                       s_clip=30.0)
    params = init_flow_params(jax.random.PRNGKey(3), spec_off)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 2, 8, 8),
                           jnp.float32, -PI, PI)
    y0, l0 = flow_forward(params, x, spec_off)
    y1, l1 = flow_forward(params, x, spec_on)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-3)
