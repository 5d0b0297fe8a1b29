"""Domain-decomposition (halo exchange) tests on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fthmc_tpu import lattice
from fthmc_tpu.parallel.domain import (action_sharded, force_sharded,
                                       make_domain_hmc_step,
                                       plaq_phase_sharded,
                                       topo_charge_sharded)


def _mesh(axis="rows"):
    return Mesh(np.array(jax.devices()), (axis,))


def _place_rows(mesh, x, axis="rows"):
    return jax.device_put(x, NamedSharding(mesh, P(None, None, axis, None)))


def test_sharded_stencils_match_single_device():
    mesh = _mesh()
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 2, 16, 16),
                           jnp.float32, -3.0, 3.0)
    xs = _place_rows(mesh, x)

    f = jax.jit(jax.shard_map(
        lambda xx: plaq_phase_sharded(xx, "rows"), mesh=mesh,
        in_specs=(P(None, None, "rows", None),),
        out_specs=P(None, "rows", None)))
    p_sh = np.asarray(f(xs))
    p_ref = np.asarray(lattice.batch_plaqs(x))
    np.testing.assert_allclose(p_sh, p_ref, atol=1e-6)

    g = jax.jit(jax.shard_map(
        lambda xx: force_sharded(xx, 2.0, "rows"), mesh=mesh,
        in_specs=(P(None, None, "rows", None),),
        out_specs=P(None, None, "rows", None)))
    np.testing.assert_allclose(np.asarray(g(xs)),
                               np.asarray(lattice.batch_force(x, 2.0)),
                               atol=1e-5)

    h = jax.jit(jax.shard_map(
        lambda xx: action_sharded(xx, 2.0, "rows"), mesh=mesh,
        in_specs=(P(None, None, "rows", None),),
        out_specs=P()))
    np.testing.assert_allclose(np.asarray(h(xs)),
                               np.asarray(lattice.batch_action(x, 2.0)),
                               rtol=1e-5)

    qf = jax.jit(jax.shard_map(
        lambda xx: topo_charge_sharded(xx, "rows"), mesh=mesh,
        in_specs=(P(None, None, "rows", None),),
        out_specs=P()))
    np.testing.assert_allclose(np.asarray(qf(xs)),
                               np.asarray(lattice.batch_charges(x)),
                               atol=1e-4)


def test_domain_hmc_step_physics():
    """The domain-decomposed HMC step is a valid HMC kernel: finite dh,
    branchless accept, and exact plaquette statistics over a short run."""
    mesh = _mesh()
    step = make_domain_hmc_step(mesh, beta=2.0, dt=0.125, nstep=16)
    x = _place_rows(mesh, lattice.hot_start(jax.random.PRNGKey(1), 8, 16))
    q = jnp.zeros((8,), jnp.float32)
    plaqs = []
    emdh = []
    key = jax.random.PRNGKey(2)
    for i in range(60):
        key, k = jax.random.split(key)
        x, q, (dh, acc) = step(k, x, q)
        if i >= 20:
            plaqs.append(float(jnp.mean(
                jnp.cos(lattice.batch_plaqs(jax.device_get(x))))))
            emdh.append(float(jnp.exp(-dh).mean()))
    assert abs(np.mean(plaqs) - lattice.PLAQ_EXACT[2.0]) < 0.03
    assert abs(np.mean(emdh) - 1.0) < 0.3
