"""Omelyan (2MN) integrator tests."""
import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.config import HMCConfig
from fthmc_tpu.hmc import leapfrog, omelyan, run_hmc


def _dh(x, v, x1, v1, beta):
    ds = jax.vmap(lambda a, b: lattice.delta_action(a, b, beta))(x1, x)
    dk = 0.5 * jnp.sum(((v1 - v) * (v1 + v)).reshape(x.shape[0], -1),
                       axis=-1)
    return np.abs(np.asarray(ds + dk)).mean()


def test_omelyan_reversible():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 2, 8, 8),
                           jnp.float32, -3.0, 3.0)
    v = jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype)
    f = lambda y: lattice.batch_force(y, 2.0)
    x1, v1 = omelyan(x, v, 0.1, 10, f)
    x2, v2 = omelyan(x1, -v1, 0.1, 10, f)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=3e-4)


def test_omelyan_much_smaller_dh_than_leapfrog():
    """At equal dt, 2MN's energy error should be far below leapfrog's
    (that is its purpose: better acceptance per force evaluation)."""
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 2, 8, 8),
                           jnp.float32, -3.0, 3.0)
    v = jax.random.normal(jax.random.PRNGKey(3), x.shape, x.dtype)
    beta, dt, n = 2.0, 0.125, 16
    f = lambda y: lattice.batch_force(y, beta)
    xl, vl = leapfrog(x, v, dt, n, f)
    xo, vo = omelyan(x, v, dt, n, f)
    dh_l = _dh(x, v, xl, vl, beta)
    dh_o = _dh(x, v, xo, vo, beta)
    assert dh_o < dh_l / 5.0, (dh_o, dh_l)


def test_run_hmc_omelyan_physics():
    cfg = HMCConfig(beta=2.0, L=8, tau=2.0, nstep=8, ntraj=300,
                    n_chains=32, randinit=True, seed=9)
    x, hist = run_hmc(cfg, integrator="omelyan")
    plaq = np.asarray(hist.plaq)[150:]
    emdh = np.asarray(hist.exp_mdh)[150:]
    assert abs(plaq.mean() - lattice.PLAQ_EXACT[2.0]) < 0.01
    assert abs(emdh.mean() - 1.0) < 0.05
    assert np.asarray(hist.acc).mean() > 0.8
