"""Fused coupling-layer Pallas kernel equivalence (interpret mode on CPU).

The kernel computes the conv chain with exact fp32 scalar FMAs; the XLA
baseline on TPU runs convs at DEFAULT (bf16) precision, so equivalence is
asserted here on CPU where both paths are exact (tolerance 1e-5)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu.config import FlowSpec
from fthmc_tpu.models.flow import flow_forward, init_flow_params
from fthmc_tpu.ops.pallas_coupling import (pallas_flow_forward,
                                           pallas_link_coupling_forward)

PI = math.pi


@pytest.mark.parametrize("coupling,M", [("ncp", 2), ("rncp", 4)])
def test_fused_flow_matches_xla(coupling, M):
    spec = FlowSpec(n_layers=2, coupling=coupling, n_mixture=M,
                    hidden_sizes=(4,), s_clip=3.0)
    params = init_flow_params(jax.random.PRNGKey(5), spec)
    x = jax.random.uniform(jax.random.PRNGKey(3), (128, 2, 8, 8),
                           jnp.float32, -PI, PI)
    y1, ld1 = flow_forward(params, x, spec)
    y2, ld2 = pallas_flow_forward(params, x, spec, interpret=True)
    dy = np.max(np.abs(np.asarray(
        jnp.remainder(y2 - y1 + PI, 2 * PI) - PI)))
    assert dy < 1e-5
    np.testing.assert_allclose(np.asarray(ld2), np.asarray(ld1), atol=1e-4)


def test_fused_layer_logj_antisymmetric_with_reverse():
    """Fused forward + XLA bisection reverse round-trips."""
    from fthmc_tpu.models.coupling import link_coupling_reverse, wrap_pi
    spec = FlowSpec(n_layers=1, n_mixture=2, hidden_sizes=(4,))
    params = init_flow_params(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 2, 8, 8),
                           jnp.float32, -PI, PI)
    xc = jnp.transpose(x, (1, 2, 3, 0))
    yc, lj = pallas_link_coupling_forward(params[0], xc, 0, 0, spec,
                                          interpret=True)
    y = jnp.transpose(yc, (3, 0, 1, 2))
    x2, ljr = link_coupling_reverse(params[0], y, 0, 0, spec)
    err = np.max(np.abs(np.asarray(wrap_pi(x2 - x))))
    assert err < 5e-4
    np.testing.assert_allclose(np.asarray(lj), -np.asarray(ljr), atol=5e-4)
