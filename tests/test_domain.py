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


def test_run_domain_hmc_whole_run_driver():
    """Production whole-run scan (round 3): ntraj trajectories inside ONE
    shard_map program; physics invariants hold and metrics are global."""
    from fthmc_tpu.config import HMCConfig
    from fthmc_tpu.parallel.domain import make_rows_mesh, run_domain_hmc
    mesh = make_rows_mesh(8)
    cfg = HMCConfig(beta=2.0, L=16, tau=1.0, nstep=16, ntraj=256,
                    n_chains=8, randinit=True, seed=3)
    x, hist = run_domain_hmc(mesh, cfg)
    assert np.asarray(x).shape == (8, 2, 16, 16)
    h = {k: np.asarray(v) for k, v in hist.items()}
    assert h["acc"].shape == (256, 8)
    assert set(np.unique(h["acc"])) <= {0.0, 1.0}
    t = 64
    # exactness: <exp(-dH)> ~ 1; <plaq> ~ 0.69777 (loose: short run)
    assert abs(h["exp_mdh"][t:].mean() - 1.0) < 0.05
    assert abs(h["plaq"][t:].mean() - 0.69777) < 0.02
    # integer topological charge on the global lattice
    q = h["q"][t:]
    assert np.allclose(q, np.round(q), atol=1e-3)


def test_run_domain_hmc_chunked_driver():
    """Blocked domain driver (CLI --shard-rows path): same invariants as
    the whole-run scan, device executions bounded at `block` trajectories
    (the production rule for long runs on this infra)."""
    from fthmc_tpu.config import HMCConfig
    from fthmc_tpu.parallel.domain import (make_rows_mesh,
                                           run_domain_hmc_chunked)
    mesh = make_rows_mesh(8)
    cfg = HMCConfig(beta=2.0, L=16, tau=1.0, nstep=16, ntraj=192,
                    n_chains=8, randinit=True, seed=5)
    seen = []
    x, hist = run_domain_hmc_chunked(
        mesh, cfg, block=64, callback=lambda done, h: seen.append(done))
    assert seen == [64, 128, 192]
    assert np.asarray(x).shape == (8, 2, 16, 16)
    assert hist["acc"].shape == (192, 8)
    t = 64
    assert abs(hist["exp_mdh"][t:].mean() - 1.0) < 0.05
    assert abs(hist["plaq"][t:].mean() - 0.69777) < 0.02
