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


def test_fused_traj_hostrng_matches_hmc_step():
    """The fused trajectory+energy+Metropolis kernel is bitwise-equivalent
    to hmc_step given the same momentum/accept draws (interpret mode)."""
    from fthmc_tpu.ops.pallas_lattice import pallas_hmc_traj_hostrng
    from fthmc_tpu.hmc import hmc_step

    x = jax.random.uniform(jax.random.PRNGKey(3), (16, 2, 8, 8),
                           jnp.float32, -3.0, 3.0)
    key = jax.random.PRNGKey(11)
    kv, ka = jax.random.split(key)
    v0 = jax.random.normal(kv, x.shape, x.dtype)
    u = jax.random.uniform(ka, (16,), jnp.float32)
    q0 = lattice.batch_charges(x)
    xr, _, m = hmc_step(key, x, q0, 2.0, 0.1, 8, backend="xla")
    xn, dh, acc = pallas_hmc_traj_hostrng(x, v0, u, beta=2.0, dt=0.1,
                                          nstep=8, block=16, interpret=True)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(m.dh), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(m.acc))
    # compare angles mod 2pi: fp-level x1 differences at the +-pi seam flip
    # the wrap branch (a 2pi shift - physically identical)
    import math
    d = np.asarray(xn) - np.asarray(xr)
    d = np.remainder(d + math.pi, 2 * math.pi) - math.pi
    np.testing.assert_allclose(d, 0, atol=1e-5)
