"""Flowed-HMC tests: effective action, force, exactness, identity reduction."""
import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.config import LeapfrogConfig
from fthmc_tpu.hmc import ft_action, ft_force, fthmc_step, run_fthmc


def test_ft_action_identity_flow_reduces_to_action(identity_params2, spec2,
                                                   x_batch):
    s_eff = ft_action(identity_params2, spec2, x_batch, 2.0)
    s = lattice.batch_action(x_batch, 2.0)
    np.testing.assert_allclose(np.asarray(s_eff), np.asarray(s), rtol=1e-5)


def test_ft_force_identity_flow_matches_plain(identity_params2, spec2,
                                              x_batch):
    f_eff = ft_force(identity_params2, spec2, x_batch, 2.0)
    f = lattice.batch_force(x_batch, 2.0)
    np.testing.assert_allclose(np.asarray(f_eff), np.asarray(f),
                               atol=2e-5, rtol=1e-4)


def test_ft_force_matches_numeric_gradient(params2, spec2):
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 8, 8),
                           jnp.float32, -2.0, 2.0)
    f = np.asarray(ft_force(params2, spec2, x, 2.0))[0]
    # numeric directional derivative along a random direction
    key = jax.random.PRNGKey(9)
    d = jax.random.normal(key, x.shape, x.dtype)
    h = 1e-3
    sp = float(ft_action(params2, spec2, x + h * d, 2.0)[0])
    sm = float(ft_action(params2, spec2, x - h * d, 2.0)[0])
    num = (sp - sm) / (2 * h)
    ana = float(jnp.sum(f * d[0]))
    np.testing.assert_allclose(ana, num, rtol=2e-2, atol=2e-2)


def test_fthmc_step_runs_and_accepts(params2, spec2):
    key = jax.random.PRNGKey(4)
    z = jax.random.uniform(jax.random.PRNGKey(1), (4, 2, 8, 8),
                           jnp.float32, -3.0, 3.0)
    q0 = jnp.zeros((4,), jnp.float32)
    z1, y1, q1, m = fthmc_step(params2, spec2, key, z, q0, 2.0, 0.02, 5)
    assert z1.shape == z.shape
    assert np.all(np.isfinite(np.asarray(m.dh)))
    # physical field is the flow image of the accepted latent state
    from fthmc_tpu.models.flow import flow_forward
    y_chk, _ = flow_forward(params2, z1, spec2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y_chk), atol=1e-5)


def test_run_fthmc_identity_flow_exactness(identity_params2, spec2):
    """With the identity flow, FT-HMC is plain HMC: <exp(-dH)> ~ 1 and
    <plaq> near exact at beta=2."""
    lf = LeapfrogConfig(tau=2.0, nstep=10)
    z0 = lattice.hot_start(jax.random.PRNGKey(2), 16, 8)
    z, hist = run_fthmc(identity_params2, spec2, lf, beta=2.0, ntraj=300,
                        z0=z0, key=jax.random.PRNGKey(3))
    plaq = np.asarray(hist.plaq)[150:]
    emdh = np.asarray(hist.exp_mdh)[150:]
    assert abs(plaq.mean() - lattice.PLAQ_EXACT[2.0]) < 0.015
    assert abs(emdh.mean() - 1.0) < 0.1


def test_run_fthmc_random_flow_exactness(params2, spec2):
    """Even an untrained flow must give an exact algorithm (<exp(-dH)> ~ 1):
    the Jacobian term cancels the reparameterization in expectation."""
    lf = LeapfrogConfig(tau=1.0, nstep=20)
    z0 = lattice.hot_start(jax.random.PRNGKey(0), 16, 8)
    z, hist = run_fthmc(params2, spec2, lf, beta=2.0, ntraj=300,
                        z0=z0, key=jax.random.PRNGKey(5))
    emdh = np.asarray(hist.exp_mdh)[150:]
    plaq = np.asarray(hist.plaq)[150:]
    acc = np.asarray(hist.acc)
    assert abs(emdh.mean() - 1.0) < 0.15
    assert abs(plaq.mean() - lattice.PLAQ_EXACT[2.0]) < 0.02
    assert acc.mean() > 0.3


def test_run_fthmc_chunked(identity_params2, spec2):
    from fthmc_tpu.hmc import run_fthmc_chunked
    from fthmc_tpu.config import LeapfrogConfig
    from fthmc_tpu import lattice
    lf = LeapfrogConfig(tau=1.0, nstep=4)
    z0 = lattice.hot_start(jax.random.PRNGKey(0), 4, 8)
    calls = []
    z, hist = run_fthmc_chunked(
        identity_params2, spec2, lf, beta=2.0, ntraj=10, z0=z0,
        key=jax.random.PRNGKey(1), block=4,
        callback=lambda done, h: calls.append(done))
    assert calls == [4, 8, 10]
    assert hist.plaq.shape == (10, 4)
    assert np.isfinite(np.asarray(hist.dh)).all()
