"""Fused fermion-kernel equivalence tests (interpret mode on CPU).

The Pallas kernel must reproduce fthmc_tpu.fermion's XLA roll-stencil
operators exactly (same conventions; fermion.py has no reference
counterpart — dynamical fermions are beyond nftqcd/fthmc)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu import fermion
from fthmc_tpu.ops import pallas_fermion as pf

L, B, MASS = 8, 4, 0.3


def _fields(key, batch=True):
    k1, k2, k3 = jax.random.split(key, 3)
    lead = (B,) if batch else ()
    theta = jax.random.uniform(k1, lead + (2, L, L), minval=-np.pi,
                               maxval=np.pi)
    psi = (jax.random.normal(k2, lead + (L, L, 2)) +
           1j * jax.random.normal(k3, lead + (L, L, 2))).astype(jnp.complex64)
    return theta, psi


def test_pack_roundtrip():
    _, psi = _fields(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(pf.unpack_spinor(pf.pack_spinor(psi))), np.asarray(psi))


def test_link_planes_match():
    theta, _ = _fields(jax.random.PRNGKey(1))
    u0, u1 = fermion._links(theta)
    ur, ui = pf.link_planes(theta)
    np.testing.assert_allclose(np.asarray(ur[:, 0]), np.real(u0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ui[:, 0]), np.imag(u0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ur[:, 1]), np.real(u1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ui[:, 1]), np.imag(u1), atol=1e-6)


@pytest.mark.parametrize("eo", [False, True])
def test_mdagm_matches_xla(eo):
    theta, psi = _fields(jax.random.PRNGKey(2))
    if eo:
        psi = psi * fermion.parity_mask(psi.shape, 0)
        want = fermion.apply_mdagm_eo(theta, psi, MASS)
    else:
        want = fermion.apply_mdagm(theta, psi, MASS)
    got = pf.pallas_mdagm(theta, psi, MASS, eo=eo, block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_mdagm_unbatched():
    theta, psi = _fields(jax.random.PRNGKey(3), batch=False)
    psi = psi * fermion.parity_mask(psi.shape, 0)
    want = fermion.apply_mdagm_eo(theta, psi, MASS)
    got = pf.pallas_mdagm(theta, psi, MASS, eo=True, interpret=True)
    assert got.shape == psi.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("eo", [False, True])
def test_cg_solve_fused_matches(eo):
    """Fused CG solves the same system to the same tolerance, and its
    solution agrees with the XLA CG to solver precision."""
    key = jax.random.PRNGKey(4)
    theta, _ = _fields(key)
    kphi = jax.random.PRNGKey(5)
    phi, _ = fermion.pf_refresh(kphi, theta, MASS, eo=eo)
    ref = fermion.cg_solve(theta, phi, MASS, tol=1e-12, maxiter=500, eo=eo)
    got = pf.cg_solve_fused(theta, phi, MASS, tol=1e-12, maxiter=500,
                            eo=eo, block=2, interpret=True)
    assert np.all(np.asarray(got.rsq) < 1e-11)
    # residual check against the TRUE operator
    op = fermion.apply_mdagm_eo if eo else fermion.apply_mdagm
    resid = phi - op(theta, got.x, MASS)
    rel = np.linalg.norm(np.asarray(resid).ravel()) / np.linalg.norm(
        np.asarray(phi).ravel())
    assert rel < 1e-5
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-4, rtol=1e-3)


def test_cg_solve_fused_warm_start():
    theta, _ = _fields(jax.random.PRNGKey(6))
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(7), theta, MASS, eo=True)
    cold = pf.cg_solve_fused(theta, phi, MASS, tol=1e-10, maxiter=500,
                             eo=True, block=2, interpret=True)
    warm = pf.cg_solve_fused(theta, phi, MASS, cold.x, tol=1e-10,
                             maxiter=500, eo=True, block=2, interpret=True)
    assert int(warm.iters) <= 2


def test_block_helper():
    assert pf.default_fermion_block(64, 64) >= 8
    assert pf.default_fermion_block(128, 64) >= 2
    assert pf.fused_cg_supported(64, 64)
    assert not pf.fused_cg_supported(16, 16)
    assert not pf.fused_cg_supported(63, 64)


def test_backend_wiring_fallback():
    """cg_solve(backend='fused') uses the chains-last kernel at L=8 (every
    even lattice now has a fused path; interpret mode auto-selected on
    CPU), falls back to XLA only outside both envelopes (odd sides), and
    set_cg_backend validates names."""
    theta, psi = _fields(jax.random.PRNGKey(8))
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(9), theta, MASS, eo=True)
    got = fermion.cg_solve(theta, phi, MASS, tol=1e-10, maxiter=300,
                           eo=True, backend="fused")
    ref = fermion.cg_solve(theta, phi, MASS, tol=1e-10, maxiter=300,
                           eo=True, backend="xla")
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-4, rtol=1e-3)
    # odd side -> neither kernel envelope -> silent XLA path (exact match)
    th_odd = jax.random.uniform(jax.random.PRNGKey(10), (B, 2, 8, 9),
                                minval=-np.pi, maxval=np.pi)
    k2, k3 = jax.random.split(jax.random.PRNGKey(11))
    psi_odd = (jax.random.normal(k2, (B, 8, 9, 2)) +
               1j * jax.random.normal(k3, (B, 8, 9, 2))
               ).astype(jnp.complex64)
    phi_odd = fermion.dirac_dag(th_odd, psi_odd, MASS)
    g2 = fermion.cg_solve(th_odd, phi_odd, MASS, tol=1e-10, maxiter=300,
                          backend="fused")
    r2 = fermion.cg_solve(th_odd, phi_odd, MASS, tol=1e-10, maxiter=300,
                          backend="xla")
    np.testing.assert_allclose(np.asarray(g2.x), np.asarray(r2.x))
    with pytest.raises(ValueError):
        fermion.set_cg_backend("nope")
    fermion.set_cg_backend("fused")
    assert fermion._CG_BACKEND == "fused"
    fermion.set_cg_backend("xla")


# ---------------------------------------------------------------------------
# mixed-precision CG (fermion._cg_solve_mixed: bf16 inner + f32 refinement,
# sharing the _hop_planes stencil with the kernel via roll=jnp.roll)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("eo", [False, True])
def test_plane_mdagm_matches_xla(eo):
    """The XLA-roll plane operator (f32) is exactly the complex operator."""
    theta, psi = _fields(jax.random.PRNGKey(10))
    if eo:
        psi = psi * fermion.parity_mask(psi.shape, 0)
        want = fermion.apply_mdagm_eo(theta, psi, MASS)
    else:
        want = fermion.apply_mdagm(theta, psi, MASS)
    ur, ui = pf.link_planes(theta)
    got = pf.unpack_spinor(
        fermion._plane_mdagm(ur, ui, pf.pack_spinor(psi), MASS, eo))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("eo", [False, True])
def test_cg_solve_mixed_matches(eo):
    """Iterative refinement reaches full f32 tolerance despite the bf16
    transport, and the solution agrees with the f32 CG."""
    theta, _ = _fields(jax.random.PRNGKey(11))
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(12), theta, MASS, eo=eo)
    ref = fermion.cg_solve(theta, phi, MASS, tol=1e-12, maxiter=500, eo=eo)
    got = fermion._cg_solve_mixed(theta, phi, MASS, tol=1e-12, maxiter=2000,
                                  eo=eo)
    assert np.all(np.asarray(got.rsq) < 1e-11)
    op = fermion.apply_mdagm_eo if eo else fermion.apply_mdagm
    resid = phi - op(theta, got.x, MASS)
    rel = np.linalg.norm(np.asarray(resid).ravel()) / np.linalg.norm(
        np.asarray(phi).ravel())
    assert rel < 1e-5
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-4, rtol=1e-3)


def test_cg_solve_mixed_warm_start_and_unbatched():
    theta, _ = _fields(jax.random.PRNGKey(13))
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(14), theta, MASS, eo=True)
    cold = fermion._cg_solve_mixed(theta, phi, MASS, tol=1e-10, maxiter=2000,
                                   eo=True)
    warm = fermion._cg_solve_mixed(theta, phi, MASS, cold.x, tol=1e-10,
                                   maxiter=2000, eo=True)
    assert int(warm.iters) <= int(cold.iters) // 4
    # unbatched shapes round-trip
    th1, _ = _fields(jax.random.PRNGKey(15), batch=False)
    phi1, _ = fermion.pf_refresh(jax.random.PRNGKey(16), th1, MASS, eo=True)
    one = fermion._cg_solve_mixed(th1, phi1, MASS, tol=1e-10, maxiter=2000,
                                  eo=True)
    assert one.x.shape == phi1.shape
    assert float(one.rsq) < 1e-9


def test_backend_wiring_mixed():
    theta, _ = _fields(jax.random.PRNGKey(17))
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(18), theta, MASS, eo=True)
    got = fermion.cg_solve(theta, phi, MASS, tol=1e-10, maxiter=2000,
                           eo=True, backend="mixed")
    ref = fermion.cg_solve(theta, phi, MASS, tol=1e-10, maxiter=300,
                           eo=True, backend="xla")
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# chains-last kernel layout (small lattices: chain block on the lane axis)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("eo", [False, True])
def test_mdagm_cl_matches_xla(eo):
    theta, psi = _fields(jax.random.PRNGKey(20))
    if eo:
        psi = psi * fermion.parity_mask(psi.shape, 0)
        want = fermion.apply_mdagm_eo(theta, psi, MASS)
    else:
        want = fermion.apply_mdagm(theta, psi, MASS)
    got = pf.pallas_mdagm(theta, psi, MASS, eo=eo, layout="cl",
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_cg_solve_fused_cl_matches():
    theta, _ = _fields(jax.random.PRNGKey(21))
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(22), theta, MASS, eo=True)
    ref = fermion.cg_solve(theta, phi, MASS, tol=1e-12, maxiter=500, eo=True)
    got = pf.cg_solve_fused(theta, phi, MASS, tol=1e-12, maxiter=500,
                            eo=True, layout="cl", interpret=True)
    assert np.all(np.asarray(got.rsq) < 1e-11)
    resid = phi - fermion.apply_mdagm_eo(theta, got.x, MASS)
    rel = np.linalg.norm(np.asarray(resid).ravel()) / np.linalg.norm(
        np.asarray(phi).ravel())
    assert rel < 1e-5
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-4, rtol=1e-3)


def test_fused_layout_auto_and_envelope():
    """auto -> cl below the chains-first envelope; backend='fused' at L=8
    now uses the kernel (no silent xla fallback) and still matches xla."""
    assert pf.fused_cl_supported(8, 8)
    assert pf.fused_cl_supported(32, 32)
    assert not pf.fused_cl_supported(64, 64)   # VMEM bound
    assert not pf.fused_cl_supported(8, 9)
    theta, _ = _fields(jax.random.PRNGKey(23))
    phi, _ = fermion.pf_refresh(jax.random.PRNGKey(24), theta, MASS, eo=True)
    got = pf.cg_solve_fused(theta, phi, MASS, tol=1e-10, maxiter=300,
                            eo=True, layout="auto", interpret=True)
    ref = fermion.cg_solve(theta, phi, MASS, tol=1e-10, maxiter=300,
                           eo=True, backend="xla")
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-4, rtol=1e-3)
