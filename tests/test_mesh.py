"""Multi-device sharding tests on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.config import TrainConfig
from fthmc_tpu.hmc import hmc_step
from fthmc_tpu.parallel.mesh import (make_chain_mesh, replicate,
                                     shard_chains, sharded_fthmc_step,
                                     sharded_hmc_step, sharded_train_step)
from fthmc_tpu.train import init_train_state


def test_virtual_device_count():
    assert jax.device_count() == 8


def test_sharded_hmc_matches_single_device():
    mesh = make_chain_mesh()
    key = jax.random.PRNGKey(0)
    x = lattice.hot_start(jax.random.PRNGKey(1), 16, 8)
    q = lattice.batch_charges(x)

    step = sharded_hmc_step(mesh, beta=2.0, dt=0.2, nstep=8)
    xs = shard_chains(mesh, x)
    qs = shard_chains(mesh, q)
    x1s, q1s, ms = step(key, xs, qs)

    x1, q1, m = hmc_step(key, x, q, 2.0, 0.2, 8)
    np.testing.assert_allclose(np.asarray(x1s), np.asarray(x1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ms.dh), np.asarray(m.dh),
                               atol=1e-3)


def test_sharded_fthmc_runs(params2, spec2):
    mesh = make_chain_mesh()
    z = lattice.hot_start(jax.random.PRNGKey(2), 8, 8)
    q = jnp.zeros((8,), jnp.float32)
    step = sharded_fthmc_step(mesh, spec2, beta=2.0, dt=0.05, nstep=3)
    params_r = replicate(mesh, params2)
    z1, y1, q1, m = step(params_r, jax.random.PRNGKey(3),
                         shard_chains(mesh, z), shard_chains(mesh, q))
    assert np.all(np.isfinite(np.asarray(m.dh)))
    assert z1.sharding.spec == z1.sharding.spec  # sharded output round-trips


def test_sharded_train_step(spec2):
    mesh = make_chain_mesh()
    cfg = TrainConfig(L=8, beta=2.0, batch_size=16, flow=spec2, seed=0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, state)
    step = sharded_train_step(mesh, spec2, batch=cfg.batch_size, L=cfg.L,
                              beta=cfg.beta, dkl_factor=1.0,
                              base_lr=cfg.base_lr)
    state2, metrics = step(state)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss_dkl"]))
    ess = float(metrics["ess"])
    assert 0.0 < ess <= 1.0 + 1e-6
