"""Row-sharded dynamical-fermion tests on the CPU mesh: the sharded Dirac
operator / CG / pseudofermion machinery must match the single-device
fermion module exactly, and the full domain-decomposed Schwinger HMC step
must be a valid kernel (finite dH, <exp(-dH)> ~ 1, plaquette in the
dynamical range)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fthmc_tpu import fermion, lattice
from fthmc_tpu.parallel import domain_fermion as df
from fthmc_tpu.schwinger import SchwingerConfig, dyn_force

pytestmark = pytest.mark.slow


def _mesh(axis="rows"):
    return Mesh(np.array(jax.devices()), (axis,))


def _place(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _rand_theta(key, B=3, L=16):
    return jax.random.uniform(key, (B, 2, L, L), jnp.float32, -3.0, 3.0)


def _rand_psi(key, B=3, L=16):
    kr, ki = jax.random.split(key)
    return (jax.random.normal(kr, (B, L, L, 2)) +
            1j * jax.random.normal(ki, (B, L, L, 2))).astype(jnp.complex64)


XSPEC = P(None, None, "rows", None)
PSPEC = P(None, "rows", None, None)


def test_dirac_sharded_matches_single_device():
    mesh = _mesh()
    theta = _rand_theta(jax.random.PRNGKey(0))
    psi = _rand_psi(jax.random.PRNGKey(1))
    ts = _place(mesh, theta, XSPEC)
    ps = _place(mesh, psi, PSPEC)

    for sh_op, ref_op in [
            (df.dirac_sharded, fermion.dirac),
            (df.dirac_dag_sharded, fermion.dirac_dag),
            (df.apply_mdagm_sharded, fermion.apply_mdagm)]:
        f = jax.jit(jax.shard_map(
            lambda t, p: sh_op(t, p, 0.1, "rows"), mesh=mesh,
            in_specs=(XSPEC, PSPEC), out_specs=PSPEC))
        np.testing.assert_allclose(np.asarray(f(ts, ps)),
                                   np.asarray(ref_op(theta, psi, 0.1)),
                                   atol=2e-5)


def test_eo_schur_sharded_matches():
    mesh = _mesh()
    theta = _rand_theta(jax.random.PRNGKey(2))
    psi = _rand_psi(jax.random.PRNGKey(3))
    psi_e = psi * fermion.parity_mask(psi.shape, 0)
    ts = _place(mesh, theta, XSPEC)
    ps = _place(mesh, psi_e, PSPEC)

    # the sharded parity mask must reproduce the global checkerboard
    mk = jax.jit(jax.shard_map(
        lambda t: df.parity_mask_sharded((t.shape[-2], t.shape[-1], 2),
                                         "rows") * jnp.ones(
            (t.shape[-2], t.shape[-1], 1)), mesh=mesh,
        in_specs=(P(None, None, "rows", None),),
        out_specs=P("rows", None, None)))
    np.testing.assert_array_equal(
        np.asarray(mk(ts))[..., 0],
        np.asarray(fermion.parity_mask(psi.shape, 0))[..., 0])

    f = jax.jit(jax.shard_map(
        lambda t, p: df.apply_mdagm_eo_sharded(t, p, 0.1, "rows"),
        mesh=mesh, in_specs=(XSPEC, PSPEC), out_specs=PSPEC))
    np.testing.assert_allclose(
        np.asarray(f(ts, ps)),
        np.asarray(fermion.apply_mdagm_eo(theta, psi_e, 0.1)), atol=2e-5)


@pytest.mark.parametrize("eo", [False, True])
def test_cg_solve_sharded_matches(eo):
    mesh = _mesh()
    theta = _rand_theta(jax.random.PRNGKey(4), B=2)
    b = _rand_psi(jax.random.PRNGKey(5), B=2)
    if eo:
        b = b * fermion.parity_mask(b.shape, 0)
    ts = _place(mesh, theta, XSPEC)
    bs = _place(mesh, b, PSPEC)

    f = jax.jit(jax.shard_map(
        lambda t, p: df.cg_solve_sharded(t, p, 0.2, tol=1e-12,
                                         maxiter=2000, eo=eo,
                                         axis_name="rows").x,
        mesh=mesh, in_specs=(XSPEC, PSPEC), out_specs=PSPEC))
    x_sh = np.asarray(f(ts, bs))
    x_ref = np.asarray(fermion.cg_solve(theta, b, 0.2, tol=1e-12,
                                        maxiter=2000, eo=eo,
                                        backend="xla").x)
    np.testing.assert_allclose(x_sh, x_ref, atol=5e-5)


@pytest.mark.parametrize("eo", [False, True])
def test_dyn_force_sharded_matches(eo):
    """Gauge + fermion force through the sharded solve and the local-action
    grad must equal the single-device dyn_force (ppermute transposes carry
    the cross-shard terms)."""
    mesh = _mesh()
    theta = _rand_theta(jax.random.PRNGKey(6), B=2)
    key = jax.random.PRNGKey(7)
    phi, _ = fermion.pf_refresh(key, theta, 0.2, eo=eo)
    ts = _place(mesh, theta, XSPEC)
    ps = _place(mesh, phi, PSPEC)

    f = jax.jit(jax.shard_map(
        lambda t, p: df.dyn_force_sharded(
            t, p, 2.0, 0.2, jnp.zeros_like(p), tol=1e-12, maxiter=2000,
            eo=eo, axis_name="rows")[0],
        mesh=mesh, in_specs=(XSPEC, PSPEC), out_specs=XSPEC))
    f_sh = np.asarray(f(ts, ps))
    f_ref = np.asarray(dyn_force(theta, phi, 2.0, 0.2,
                                 jnp.zeros_like(phi), 1e-12, 2000,
                                 eo=eo)[0])
    np.testing.assert_allclose(f_sh, f_ref, atol=5e-4)


def test_pf_refresh_action_consistency():
    """Sharded heatbath: S_pf(exact solve) must equal the refresh energy
    chi^dag chi (the identity the Metropolis start energy rests on)."""
    mesh = _mesh()
    theta = _rand_theta(jax.random.PRNGKey(8), B=2)
    ts = _place(mesh, theta, XSPEC)

    def local(t):
        phi, s0 = df.pf_refresh_sharded(jax.random.PRNGKey(9), t, 0.2,
                                        eo=True, axis_name="rows")
        s, _ = df.pf_action_exact_sharded(t, phi, 0.2, tol=1e-14,
                                          maxiter=4000, eo=True,
                                          axis_name="rows")
        return s0, s

    f = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(XSPEC,),
                              out_specs=(P(), P()), check_vma=False))
    s0, s = f(ts)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=1e-4)


def test_domain_dyn_hmc_step_physics():
    """Full row-sharded dynamical HMC: valid kernel statistics over a short
    chain at 16^2 beta=2 m=0.2 (cheap CG), and the chunked driver agrees
    with itself across block sizes (same keys -> same trajectory count)."""
    mesh = _mesh()
    cfg = SchwingerConfig(L=16, beta=2.0, mass=0.2, tau=1.0, nstep=8,
                          n_chains=4, ntraj=24, cg_maxiter=2000)
    key = jax.random.PRNGKey(10)
    x, hist = df.run_domain_hmc_dyn_chunked(mesh, cfg, block=12, key=key)
    assert hist["dh"].shape == (24, 4)
    assert np.all(np.isfinite(hist["dh"]))
    acc = hist["acc"].mean()
    assert 0.3 < acc <= 1.0
    emdh = hist["exp_mdh"][8:].mean()
    assert abs(emdh - 1.0) < 0.5
    # dynamical plaquette at beta=2 m=0.2 sits near (slightly above) the
    # quenched value 0.6978; generous window, it just must be thermal
    assert 0.55 < hist["plaq"][8:].mean() < 0.85
    # resume determinism: same key + same block split -> identical history
    _, hist2 = df.run_domain_hmc_dyn_chunked(mesh, cfg, block=12, key=key)
    np.testing.assert_allclose(hist["dh"], hist2["dh"], rtol=1e-5)


def _tiny_flow(L=16):
    from fthmc_tpu.config import FlowSpec
    from fthmc_tpu.models.flow import init_flow_params
    spec = FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,))
    params = init_flow_params(jax.random.PRNGKey(42), spec)
    return params, spec


def test_ft_dyn_force_sharded_matches():
    """The one-VJP latent force (gauge + logdet + fermion) through the
    sharded flow and sharded CG must equal schwinger.ft_dyn_force."""
    from fthmc_tpu.models.flow import flow_forward
    from fthmc_tpu.schwinger import ft_dyn_force
    mesh = _mesh()
    params, spec = _tiny_flow()
    cfg = SchwingerConfig(L=16, beta=2.0, mass=0.2, cg_tol_force=1e-12,
                          cg_maxiter=2000)
    z = _rand_theta(jax.random.PRNGKey(12), B=2)
    y0, _ = flow_forward(params, z, spec)
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(13), y0, cfg.mass,
                                eo=cfg.eo_precond)
    f_ref = np.asarray(ft_dyn_force(params, spec, z, cfg, phi,
                                    jnp.zeros_like(phi), False)[0])

    zs = _place(mesh, z, XSPEC)
    ps = _place(mesh, phi, PSPEC)
    f = jax.jit(jax.shard_map(
        lambda p, zz, ph: df.ft_dyn_force_sharded(
            p, spec, zz, cfg, ph, jnp.zeros_like(ph), 16, "rows",
            remat=False)[0],
        mesh=mesh, in_specs=(P(), XSPEC, PSPEC), out_specs=XSPEC,
        check_vma=False))
    f_sh = np.asarray(f(params, zs, ps))
    np.testing.assert_allclose(f_sh, f_ref, atol=5e-4)


def test_domain_fthmc_dyn_physics():
    """Full row-sharded dynamical FT-HMC chain: finite dH, <exp(-dH)> ~ 1,
    plaquette consistent with the plain sharded chain at the same
    parameters (the flow reshapes the proposal, not the physics)."""
    mesh = _mesh()
    params, spec = _tiny_flow()
    cfg = SchwingerConfig(L=16, beta=2.0, mass=0.2, tau=1.0, nstep=8,
                          n_chains=4, ntraj=20, cg_maxiter=2000)
    z, hist = df.run_domain_fthmc_dyn_chunked(mesh, params, spec, cfg,
                                              block=10,
                                              key=jax.random.PRNGKey(14))
    assert hist["dh"].shape == (20, 4)
    assert np.all(np.isfinite(hist["dh"]))
    assert hist["acc"].mean() > 0.2
    assert abs(hist["exp_mdh"][6:].mean() - 1.0) < 0.6
    assert 0.55 < hist["plaq"][6:].mean() < 0.85


def test_domain_dyn_rejects_mts_and_odd_shards():
    mesh = _mesh()
    with pytest.raises(ValueError):
        df.run_domain_hmc_dyn_chunked(
            mesh, SchwingerConfig(L=16, beta=2.0, mass=0.2, n_inner=2,
                                  ntraj=2))
    with pytest.raises(ValueError):
        df.make_domain_hmc_dyn_step(
            mesh, SchwingerConfig(L=8, beta=2.0, mass=0.2, ntraj=2))
