"""Domain-decomposed flow + FT-HMC tests on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fthmc_tpu import lattice
from fthmc_tpu.hmc import ft_action, ft_force
from fthmc_tpu.models.flow import flow_forward
from fthmc_tpu.parallel.domain_flow import (flow_forward_sharded,
                                            ft_action_sharded,
                                            ft_force_sharded,
                                            make_domain_fthmc_step)

L0 = 16


def _mesh(axis="rows"):
    return Mesh(np.array(jax.devices()), (axis,))


def _place(mesh, x, axis="rows"):
    return jax.device_put(x, NamedSharding(mesh, P(None, None, axis, None)))


def _shardmapped(mesh, fn, out_specs):
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(P(None, None, "rows", None),),
        out_specs=out_specs, check_vma=False))


def test_flow_forward_sharded_matches(params2, spec2):
    mesh = _mesh()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 2, L0, L0),
                           jnp.float32, -3.0, 3.0)
    f = _shardmapped(
        mesh,
        lambda xx: flow_forward_sharded(params2, xx, spec2, L0, "rows"),
        (P(None, None, "rows", None), P()))
    y_sh, ld_sh = f(_place(mesh, x))
    y_ref, ld_ref = flow_forward(params2, x, spec2)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_sh), np.asarray(ld_ref),
                               rtol=1e-4, atol=1e-3)


def test_ft_action_force_sharded_match(params2, spec2):
    mesh = _mesh()
    z = jax.random.uniform(jax.random.PRNGKey(1), (2, 2, L0, L0),
                           jnp.float32, -2.0, 2.0)
    a = _shardmapped(
        mesh,
        lambda zz: ft_action_sharded(params2, spec2, zz, 2.0, L0, "rows"),
        P())
    np.testing.assert_allclose(np.asarray(a(_place(mesh, z))),
                               np.asarray(ft_action(params2, spec2, z, 2.0)),
                               rtol=1e-5, atol=1e-3)
    g = _shardmapped(
        mesh,
        lambda zz: ft_force_sharded(params2, spec2, zz, 2.0, L0, "rows"),
        P(None, None, "rows", None))
    np.testing.assert_allclose(np.asarray(g(_place(mesh, z))),
                               np.asarray(ft_force(params2, spec2, z, 2.0)),
                               atol=5e-4)


def test_domain_fthmc_step_runs(params2, spec2):
    mesh = _mesh()
    step = make_domain_fthmc_step(mesh, spec2, beta=2.0, dt=0.05, nstep=3,
                                  L0=L0)
    z = _place(mesh, lattice.hot_start(jax.random.PRNGKey(2), 4, L0))
    q = jnp.zeros((4,), jnp.float32)
    z1, q1, (dh, acc) = step(params2, jax.random.PRNGKey(3), z, q)
    assert np.all(np.isfinite(np.asarray(dh)))
    assert set(np.unique(np.asarray(acc))) <= {0.0, 1.0}
    assert z1.shape == z.shape
