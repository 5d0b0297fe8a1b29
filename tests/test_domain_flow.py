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


def test_run_domain_fthmc_whole_run_driver(params2, spec2):
    """Production whole-run FT-HMC scan on the rows mesh (round 3):
    exactness (<exp(-dH)> ~ 1) and global metrics."""
    from fthmc_tpu.config import LeapfrogConfig
    from fthmc_tpu.parallel.domain import make_rows_mesh
    from fthmc_tpu.parallel.domain_flow import run_domain_fthmc_chunked
    mesh = make_rows_mesh(8)
    z0 = jax.random.uniform(jax.random.PRNGKey(5), (4, 2, L0, L0),
                            jnp.float32, -np.pi, np.pi)
    lf = LeapfrogConfig(tau=1.0, nstep=12)
    z, hist = run_domain_fthmc_chunked(
        mesh, params2, spec2, lf, beta=2.0, ntraj=48, z0=z0,
        key=jax.random.PRNGKey(6), block=24)
    assert np.asarray(z).shape == (4, 2, L0, L0)
    assert hist["acc"].shape == (48, 4)
    # exactness holds for ANY fixed flow (MH corrects the rest)
    assert abs(hist["exp_mdh"][12:].mean() - 1.0) < 0.2
    assert np.isfinite(hist["dh"]).all()
    q = hist["q"]
    assert np.allclose(q, np.round(q), atol=1e-3)


# ---------------------------------------------------------------------------
# rncp + s_clip parity (round-3 regression: the domain path used to hardcode
# the plain-NCP channel split and skip s_clip, which silently produced a
# wrong force for the production rncp flow — acc=0 on the real-TPU check).
# ---------------------------------------------------------------------------

import pytest
from fthmc_tpu.config import FlowSpec
from fthmc_tpu.models.flow import init_flow_params


@pytest.fixture(scope="module")
def spec2r() -> FlowSpec:
    """Tiny rncp spec WITH s_clip — the production family's code paths."""
    return FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,),
                    kernel_size=3, coupling="rncp", s_clip=3.0)


@pytest.fixture(scope="module")
def params2r(spec2r):
    return init_flow_params(jax.random.PRNGKey(9), spec2r)


def test_flow_forward_sharded_matches_rncp(params2r, spec2r):
    mesh = _mesh()
    x = jax.random.uniform(jax.random.PRNGKey(10), (2, 2, L0, L0),
                           jnp.float32, -3.0, 3.0)
    f = _shardmapped(
        mesh,
        lambda xx: flow_forward_sharded(params2r, xx, spec2r, L0, "rows"),
        (P(None, None, "rows", None), P()))
    y_sh, ld_sh = f(_place(mesh, x))
    y_ref, ld_ref = flow_forward(params2r, x, spec2r)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_sh), np.asarray(ld_ref),
                               rtol=1e-4, atol=1e-3)


def test_ft_force_sharded_matches_rncp(params2r, spec2r):
    mesh = _mesh()
    z = jax.random.uniform(jax.random.PRNGKey(11), (2, 2, L0, L0),
                           jnp.float32, -2.0, 2.0)
    g = _shardmapped(
        mesh,
        lambda zz: ft_force_sharded(params2r, spec2r, zz, 3.0, L0, "rows"),
        P(None, None, "rows", None))
    np.testing.assert_allclose(np.asarray(g(_place(mesh, z))),
                               np.asarray(ft_force(params2r, spec2r, z, 3.0)),
                               atol=5e-4)


def test_domain_spline_raises(params2, spec2):
    """Spline couplings are sampling-only; the shared transform must refuse
    rather than silently mis-slice channels."""
    from fthmc_tpu.models.coupling import plaq_transform_apply
    spec_sp = FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,),
                       coupling="spline")
    net_out = jnp.zeros((1, 5, 4, 4))
    with pytest.raises(NotImplementedError):
        plaq_transform_apply(net_out, jnp.zeros((1, 4, 4)),
                             jnp.ones((4, 4)), spec_sp)
