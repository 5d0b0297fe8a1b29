"""Reference-facade API smoke tests."""
import jax
import numpy as np

from fthmc_tpu import api
from fthmc_tpu.config import LeapfrogConfig


def test_batch_action_callable(x_batch):
    act = api.BatchAction(2.0)
    s = act(x_batch)
    assert s.shape == (x_batch.shape[0],)


def test_ft_flow_roundtrip(params2, spec2, x_batch):
    y = api.ft_flow(params2, spec2, x_batch)
    x2 = api.ft_flow_inv(params2, spec2, y)
    err = np.max(np.abs(np.asarray(api.wrap(x2 - x_batch))))
    assert err < 1e-4


def test_field_transformation_facade(identity_params2, spec2):
    ft = api.FieldTransformation(identity_params2, spec2, beta=2.0,
                                 lf=LeapfrogConfig(tau=1.0, nstep=4))
    z = ft.initializer(jax.random.PRNGKey(0), 2, 8)
    s = ft.action(z)
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(api.batch_action(z, 2.0)), rtol=1e-5)
    f = ft.force(z)
    assert f.shape == z.shape
    z1, y1, q1, m = ft.hmc(jax.random.PRNGKey(1), z)
    assert np.isfinite(np.asarray(m.dh)).all()


def test_apply_flow_to_prior(params2, spec2):
    x, z, logq = api.apply_flow_to_prior(
        params2, spec2, jax.random.PRNGKey(0), batch_size=4, L=8)
    assert x.shape == (4, 2, 8, 8)
    assert logq.shape == (4,)
    assert np.isfinite(np.asarray(logq)).all()
