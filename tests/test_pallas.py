"""Pallas kernel equivalence tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.hmc import leapfrog
from fthmc_tpu.ops.pallas_lattice import pallas_force, pallas_leapfrog


def test_pallas_force_matches_xla():
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 2, 8, 8),
                           jnp.float32, -3.14, 3.14)
    f_p = pallas_force(x, 2.0, block=4, interpret=True)
    f_x = lattice.batch_force(x, 2.0)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x),
                               atol=1e-5, rtol=1e-5)


def test_pallas_leapfrog_cl_matches_xla():
    from fthmc_tpu.ops.pallas_lattice import pallas_leapfrog_cl
    key = jax.random.PRNGKey(5)
    x = jax.random.uniform(key, (128, 2, 8, 8), jnp.float32, -3.0, 3.0)
    v = jax.random.normal(jax.random.PRNGKey(6), x.shape, x.dtype)
    x1p, v1p = pallas_leapfrog_cl(x, v, beta=2.0, dt=0.1, nstep=6,
                                  block=128, interpret=True)
    x1x, v1x = leapfrog(x, v, 0.1, 6,
                        lambda y: lattice.batch_force(y, 2.0))
    np.testing.assert_allclose(np.asarray(x1p), np.asarray(x1x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1p), np.asarray(v1x), atol=1e-4)


def test_pallas_leapfrog_matches_xla():
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (4, 2, 8, 8), jnp.float32, -3.0, 3.0)
    v = jax.random.normal(jax.random.PRNGKey(2), x.shape, x.dtype)
    x1p, v1p = pallas_leapfrog(x, v, beta=2.0, dt=0.1, nstep=6, block=4,
                               interpret=True)
    x1x, v1x = leapfrog(x, v, 0.1, 6,
                        lambda y: lattice.batch_force(y, 2.0))
    np.testing.assert_allclose(np.asarray(x1p), np.asarray(x1x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1p), np.asarray(v1x), atol=1e-4)
