"""Whole-flow tests: invertibility, equivariance, volume transfer."""
import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.models.flow import (count_parameters, flow_forward,
                                   flow_reverse, init_flow_params)


def test_flow_roundtrip(params2, spec2, x_batch):
    y, ld = flow_forward(params2, x_batch, spec2)
    x2, ldr = flow_reverse(params2, y, spec2)
    err = np.max(np.abs(np.asarray(lattice.wrap(x2 - x_batch))))
    assert err < 1e-4
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ldr), atol=1e-3)


def test_identity_flow(identity_params2, spec2, x_batch):
    y, ld = flow_forward(identity_params2, x_batch, spec2)
    np.testing.assert_allclose(np.asarray(lattice.wrap(y - x_batch)),
                               0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-5)


def test_gauge_equivariance(params2, spec2, x_batch):
    """Plaquettes (hence action) of the flow output and the logdet must be
    invariant under a gauge transformation of the input
    (reference layers.py:177-185 affordance, formalized)."""
    key = jax.random.PRNGKey(2)
    xg = lattice.random_gauge_transform(key, x_batch)
    y, ld = flow_forward(params2, x_batch, spec2)
    yg, ldg = flow_forward(params2, xg, spec2)
    p = np.asarray(lattice.batch_plaq_mean(y))
    pg = np.asarray(lattice.batch_plaq_mean(yg))
    np.testing.assert_allclose(p, pg, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ldg), atol=1e-4)


def test_volume_transfer(params2, spec2):
    """Params trained at L=8 apply unchanged at L=16 (shape-polymorphic
    flow; reference needs make_net_from_layers re-wrapping, train.py:434-455,
    here it is a direct re-apply)."""
    x16 = jax.random.uniform(jax.random.PRNGKey(0), (2, 2, 16, 16),
                             jnp.float32, -3.0, 3.0)
    y, ld = flow_forward(params2, x16, spec2)
    assert y.shape == x16.shape
    assert np.all(np.isfinite(np.asarray(y)))
    assert np.all(np.isfinite(np.asarray(ld)))
    x2, ldr = flow_reverse(params2, y, spec2)
    err = np.max(np.abs(np.asarray(lattice.wrap(x2 - x16))))
    assert err < 1e-4


def test_remat_matches_no_remat(params2, spec2, x_batch):
    y1, ld1 = flow_forward(params2, x_batch, spec2, remat=True)
    y2, ld2 = flow_forward(params2, x_batch, spec2, remat=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-6)


def test_param_count(spec2, params2):
    # 2 layers x [conv(2->4) + conv(4->3)] with k=3
    per_layer = (4 * 2 * 9 + 4) + (3 * 4 * 9 + 3)
    assert count_parameters(params2) == 2 * per_layer


def test_init_modes():
    from fthmc_tpu.config import FlowSpec
    for init in ("reference", "set_weights_bug", "normal"):
        spec = FlowSpec(n_layers=1, hidden_sizes=(4,), init=init)
        p = init_flow_params(jax.random.PRNGKey(0), spec)
        assert np.all(np.isfinite(np.asarray(p[0][0]["w"])))
