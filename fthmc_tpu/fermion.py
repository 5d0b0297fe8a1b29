"""Wilson fermions on the 2D U(1) lattice: Dirac operator, batched CG,
pseudofermion action/force. TPU-native (complex64, roll-stencils, while_loop
CG, everything jit/scan-safe).

This is a BEYOND-REFERENCE capability: nftqcd/fthmc is pure-gauge only. Its
own motivation paper (arXiv:2112.01586) and our round-3 cost ladder
(BENCH.md) both conclude that field-transformed HMC pays off in wall-clock
only when the force is expensive — i.e. with dynamical fermions, where every
force evaluation costs a Krylov solve instead of one sin-stencil. This module
supplies that regime: the two-flavor Schwinger model
    S = S_gauge(theta) + phi^dag (D^dag D)^{-1} phi,
with D the Wilson-Dirac operator (r = 1), so det(D^dag D) = det(D)^2 = two
degenerate flavors.

Conventions
-----------
Gauge field ``theta``: (2, L0, L1) link angles, U_mu(x) = exp(i theta_mu(x))
(same layout as fthmc_tpu.lattice). Fermion field ``psi``: (L0, L1, 2)
complex64, last axis = spinor. Batched chains prepend a leading axis B to
BOTH; all functions below take either rank (they only roll axes -3/-2).

Euclidean 2D gamma matrices: gamma_0 = sigma_x, gamma_1 = sigma_y,
gamma_5 = sigma_z;  gamma_5 D gamma_5 = D^dag (gamma5-hermiticity, tested).

Boundary conditions: periodic in space (axis 1), antiperiodic in time
(axis 0) — implemented by flipping the sign of the time-direction link on
the last time slice (absorbed into an effective link field, so forward and
backward hops stay exactly adjoint).

Wilson-Dirac operator (r = 1):
    (D psi)(x) = (m + 2) psi(x)
        - 1/2 sum_mu [ (1 - gamma_mu) U_mu(x)        psi(x + mu)
                     + (1 + gamma_mu) U_mu(x - mu)^*  psi(x - mu) ]
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fthmc_tpu import lattice

__all__ = [
    "dirac", "dirac_dag", "apply_mdagm", "cg_solve", "set_cg_backend",
    "pf_refresh",
    "pf_action_exact", "pf_action_lin", "pf_force", "CGResult",
    "dirac_dense", "logdet_mdagm",
    "chiral_condensate", "pion_correlator",
    "parity_mask", "dirac_hat", "dirac_hat_dag", "apply_mdagm_eo",
    "hasenbusch_refresh", "ratio_action_exact", "ratio_action_lin",
]


def _links(theta: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Effective complex link fields (u0, u1), each (..., L0, L1), with the
    antiperiodic time boundary folded into u0's last time slice."""
    u = jnp.exp(1j * theta.astype(jnp.float32))
    u0, u1 = u[..., 0, :, :], u[..., 1, :, :]
    L0 = theta.shape[-2]
    # antiperiodic in time: the hop that wraps x0 = L0-1 -> 0 picks up -1
    sign = jnp.where(jnp.arange(L0) == L0 - 1, -1.0, 1.0)[:, None]
    return u0 * sign, u1


def dirac(theta: jnp.ndarray, psi: jnp.ndarray, mass: float) -> jnp.ndarray:
    """Apply the Wilson-Dirac operator D(theta) to psi.

    theta: (..., 2, L0, L1) real; psi: (..., L0, L1, 2) complex.
    Batched shapes broadcast (leading axes must match).
    """
    return (mass + 2.0) * psi - 0.5 * _hop(theta, psi)


def _g5(psi: jnp.ndarray) -> jnp.ndarray:
    """gamma_5 psi (gamma_5 = sigma_z)."""
    return jnp.stack((psi[..., 0], -psi[..., 1]), axis=-1)


def dirac_dag(theta: jnp.ndarray, psi: jnp.ndarray,
              mass: float) -> jnp.ndarray:
    """D^dag psi = gamma_5 D gamma_5 psi (gamma5-hermiticity)."""
    return _g5(dirac(theta, _g5(psi), mass))


def apply_mdagm(theta: jnp.ndarray, psi: jnp.ndarray,
                mass: float) -> jnp.ndarray:
    """M psi with M = D^dag D (hermitian positive definite)."""
    return dirac_dag(theta, dirac(theta, psi, mass), mass)


def _cdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-chain complex inner product <a, b>, reducing the last 3 axes.
    Shapes (..., L0, L1, 2) -> (...)."""
    return jnp.sum(jnp.conj(a) * b, axis=(-3, -2, -1))


class CGResult(NamedTuple):
    x: jnp.ndarray        # solution, same shape as b
    iters: jnp.ndarray    # scalar int32: iterations used (max over batch)
    rsq: jnp.ndarray      # per-chain final |r|^2 / |b|^2


_CG_BACKEND = "xla"


def set_cg_backend(name: str) -> None:
    """Process-wide default CG backend: "xla" (roll-stencil operator),
    "fused" (Pallas VMEM-resident operator, ops/pallas_fermion.py — wins
    where the XLA path is bandwidth-bound on materialized roll
    intermediates, i.e. larger lattices; auto-falls back to xla outside
    `fused_cg_supported`), or "mixed" (bf16-transport inner CG + f32
    iterative refinement, _cg_solve_mixed — halves the stencil's HBM
    traffic where the XLA path is bandwidth-bound). Resolved at TRACE
    time — set it before building jitted drivers."""
    global _CG_BACKEND
    if name not in ("xla", "fused", "mixed"):
        raise ValueError(name)
    _CG_BACKEND = name


def cg_solve(theta: jnp.ndarray, b: jnp.ndarray, mass: float,
             x0: jnp.ndarray | None = None, *, tol: float = 1e-8,
             maxiter: int = 1000, eo: bool = False,
             backend: str | None = None) -> CGResult:
    """Batched conjugate gradient for (D^dag D) x = b (or, with eo=True,
    the even-odd Schur system (Dhat^dag Dhat) x = b on even-masked b).

    One while_loop drives ALL chains; converged chains freeze (their alpha
    and beta are masked to zero) so late chains don't destabilize early
    ones. ``tol`` is on |r|^2 / |b|^2 (i.e. tol=1e-8 means relative
    residual 1e-4). ``backend`` overrides the process default
    (set_cg_backend)."""
    backend = backend or _CG_BACKEND
    if backend == "fused":
        from fthmc_tpu.ops.pallas_fermion import (cg_solve_fused,
                                                  fused_cg_supported,
                                                  fused_cl_supported)
        L0, L1 = theta.shape[-2], theta.shape[-1]
        if fused_cg_supported(L0, L1) or fused_cl_supported(L0, L1):
            # Mosaic kernels don't lower on the CPU backend; interpret
            # mode there keeps CPU tests/virtual-mesh runs working while
            # TPU gets the compiled kernel.
            return cg_solve_fused(theta, b, mass, x0, tol=tol,
                                  maxiter=maxiter, eo=eo,
                                  interpret=jax.default_backend() == "cpu")
    if backend == "mixed":
        return _cg_solve_mixed(theta, b, mass, x0, tol=tol,
                               maxiter=maxiter, eo=eo)
    return _cg_solve_xla(theta, b, mass, x0, tol=tol, maxiter=maxiter,
                         eo=eo)


@partial(jax.jit, static_argnames=("mass", "tol", "maxiter", "eo"))
def _cg_solve_xla(theta: jnp.ndarray, b: jnp.ndarray, mass: float,
                  x0: jnp.ndarray | None = None, *, tol: float = 1e-8,
                  maxiter: int = 1000, eo: bool = False) -> CGResult:
    """The XLA roll-stencil CG (see cg_solve)."""
    op = apply_mdagm_eo if eo else apply_mdagm
    bsq = jnp.real(_cdot(b, b))
    stop = tol * bsq
    x = jnp.zeros_like(b) if x0 is None else x0

    r = b - op(theta, x, mass)
    p = r
    rsq = jnp.real(_cdot(r, r))

    def cond(carry):
        x, r, p, rsq, k = carry
        return jnp.logical_and(jnp.any(rsq > stop), k < maxiter)

    def body(carry):
        x, r, p, rsq, k = carry
        active = rsq > stop
        mp = op(theta, p, mass)
        denom = jnp.real(_cdot(p, mp))
        alpha = jnp.where(active, rsq / jnp.maximum(denom, 1e-30), 0.0)
        al = alpha[..., None, None, None].astype(b.dtype)
        x = x + al * p
        r = r - al * mp
        rsq_new = jnp.real(_cdot(r, r))
        beta = jnp.where(active, rsq_new / jnp.maximum(rsq, 1e-30), 0.0)
        p = r + beta[..., None, None, None].astype(b.dtype) * p
        rsq = jnp.where(active, rsq_new, rsq)
        return (x, r, p, rsq, k + 1)

    x, r, p, rsq, k = jax.lax.while_loop(cond, body, (x, r, p, rsq, 0))
    return CGResult(x, k, rsq / jnp.maximum(bsq, 1e-30))


def _plane_mdagm(ur, ui, p4, mass, eo):
    """Normal operator (D^dag D, or the even-odd Schur Mhat) on packed real
    planes (B, 4, L0, L1), XLA rolls. Exactly the fused Pallas kernel's
    math via the single-source stencil ops/pallas_fermion._hop_planes
    (roll=jnp.roll). Runs in whatever dtype the planes/links carry —
    bfloat16 for the mixed-precision CG below (python-float scalars stay
    weakly typed, so nothing silently promotes to f32)."""
    from fthmc_tpu.ops.pallas_fermion import _hop_planes, normal_op_planes
    ur0, ur1 = ur[:, 0], ur[:, 1]
    ui0, ui1 = ui[:, 0], ui[:, 1]
    L0, L1 = p4.shape[-2], p4.shape[-1]
    par = (jnp.arange(L0)[:, None] + jnp.arange(L1)[None, :]) % 2
    even = (par == 0).astype(p4.dtype)[None]
    odd = (par == 1).astype(p4.dtype)[None]

    def hop(s):
        return _hop_planes(ur0, ui0, ur1, ui1, *s, roll=jnp.roll)

    m = normal_op_planes(hop, (p4[:, 0], p4[:, 1], p4[:, 2], p4[:, 3]),
                         mass, eo, even, odd)
    return jnp.stack(m, axis=1)


# bf16 stagnates near relative residual ~1e-2..1e-3; each refinement cycle
# targets an rsq (squared-residual) reduction of 1e-4 within <= 48 sweeps.
_MIXED_INNER_TOL = 1e-4
_MIXED_INNER_MAX = 48


@partial(jax.jit, static_argnames=("mass", "tol", "maxiter", "eo"))
def _cg_solve_mixed(theta: jnp.ndarray, b: jnp.ndarray, mass: float,
                    x0: jnp.ndarray | None = None, *, tol: float = 1e-8,
                    maxiter: int = 1000, eo: bool = False) -> CGResult:
    """Mixed-precision CG: bf16-transport inner CG + f32 iterative
    refinement (defect correction).

    The Wilson hop is bandwidth-bound on its materialized roll
    intermediates (BENCH.md round-3 "CG cost structure"); running the
    Krylov sweeps with bf16 links AND bf16 vectors halves that HBM
    traffic. bf16 alone stagnates near relative residual ~1e-2..1e-3, so
    an outer f32 loop re-forms the TRUE residual r = b - A x in f32,
    re-solves A d = r in bf16, and accumulates x += d in f32 — classic
    iterative refinement, restoring full fp32 accuracy (HMC exactness
    never rested on the force solves, but this keeps even the
    Metropolis-accept solve usable). Same semantics/returns as
    _cg_solve_xla; `iters` counts total operator applications."""
    from fthmc_tpu.ops.pallas_fermion import (link_planes, pack_spinor,
                                              unpack_spinor)
    squeeze = b.ndim == 3
    if squeeze:
        theta, b = theta[None], b[None]
        x0 = None if x0 is None else x0[None]
    ur, ui = link_planes(theta)
    ur16, ui16 = ur.astype(jnp.bfloat16), ui.astype(jnp.bfloat16)
    b4 = pack_spinor(b)

    def dot(u, v):
        # f32 accumulation regardless of plane dtype
        return jnp.sum(u * v, axis=(1, 2, 3), dtype=jnp.float32)

    bsq = dot(b4, b4)
    stop = tol * bsq
    x = jnp.zeros_like(b4) if x0 is None else pack_spinor(x0)
    r = b4 - _plane_mdagm(ur, ui, x, mass, eo)
    rsq = dot(r, r)

    def inner(r32):
        """bf16 CG for A d = r32; returns (d in bf16, sweeps used)."""
        rr = r32.astype(jnp.bfloat16)
        d = jnp.zeros_like(rr)
        p = rr
        irsq = dot(rr, rr)
        istop = _MIXED_INNER_TOL * irsq

        def cond(c):
            d, rr, p, irsq, k = c
            return jnp.logical_and(jnp.any(irsq > istop),
                                   k < _MIXED_INNER_MAX)

        def body(c):
            d, rr, p, irsq, k = c
            active = irsq > istop
            mp = _plane_mdagm(ur16, ui16, p, mass, eo)
            denom = dot(p, mp)
            alpha = jnp.where(active, irsq / jnp.maximum(denom, 1e-30), 0.0)
            al = alpha[:, None, None, None].astype(jnp.bfloat16)
            d = d + al * p
            rr = rr - al * mp
            irsq_new = dot(rr, rr)
            beta = jnp.where(active, irsq_new / jnp.maximum(irsq, 1e-30),
                             0.0)
            p = rr + beta[:, None, None, None].astype(jnp.bfloat16) * p
            irsq = jnp.where(active, irsq_new, irsq)
            return (d, rr, p, irsq, k + 1)

        d, rr, p, irsq, k = jax.lax.while_loop(
            cond, body, (d, rr, p, irsq, 0))
        return d, k

    def outer_cond(carry):
        x, r, rsq, k = carry
        return jnp.logical_and(jnp.any(rsq > stop), k < maxiter)

    def outer_body(carry):
        x, r, rsq, k = carry
        active = (rsq > stop).astype(jnp.float32)[:, None, None, None]
        d, ki = inner(r)
        x = x + active * d.astype(jnp.float32)
        r = b4 - _plane_mdagm(ur, ui, x, mass, eo)  # true f32 residual
        rsq_new = dot(r, r)
        rsq = jnp.where(rsq > stop, rsq_new, rsq)
        return (x, r, rsq, k + ki + 1)

    x, r, rsq, k = jax.lax.while_loop(outer_cond, outer_body,
                                      (x, r, rsq, 0))
    sol = unpack_spinor(x)
    rel = rsq / jnp.maximum(bsq, 1e-30)
    if squeeze:
        sol, rel = sol[0], rel[0]
    return CGResult(sol, k, rel)


@partial(jax.jit, static_argnames=("mass", "eo"))
def pf_refresh(key: jax.Array, theta: jnp.ndarray, mass: float,
               eo: bool = False):
    """Pseudofermion heatbath at fixed theta.

    Draw chi ~ CN(0,1) per component (P(chi) ~ exp(-chi^dag chi)), set
    phi = D^dag chi. Then S_pf(theta, phi) = chi^dag chi EXACTLY at the
    refresh point — returned as ``s0`` so the Metropolis start energy needs
    no solve. Returns (phi, s0) with s0 shape (...,) per chain.

    eo=True: the even-odd Schur-preconditioned theory — chi lives on even
    sites only, phi = Dhat^dag chi (same det(D)^2 physics up to the
    constant det(A_oo); see the even-odd section below).
    """
    shape = theta.shape[:-3] + theta.shape[-2:] + (2,)
    kr, ki = jax.random.split(key)
    chi = (jax.random.normal(kr, shape) +
           1j * jax.random.normal(ki, shape)) * math.sqrt(0.5)
    chi = chi.astype(jnp.complex64)
    if eo:
        chi = chi * parity_mask(shape, 0)
        phi = dirac_hat_dag(theta, chi, mass)
    else:
        phi = dirac_dag(theta, chi, mass)
    s0 = jnp.real(_cdot(chi, chi))
    return phi, s0


def pf_action_exact(theta: jnp.ndarray, phi: jnp.ndarray, mass: float, *,
                    tol: float = 1e-10, maxiter: int = 2000,
                    x0: jnp.ndarray | None = None, eo: bool = False):
    """S_pf = phi^dag (D^dag D)^{-1} phi via a tight CG solve.

    Used for the Metropolis accept (exactness of the algorithm rests on
    THIS solve, not the force solves). Returns (s, X) so the solution can
    seed later solves.
    """
    res = cg_solve(theta, phi, mass, x0, tol=tol, maxiter=maxiter, eo=eo)
    return jnp.real(_cdot(phi, res.x)), res.x


def pf_action_lin(theta: jnp.ndarray, phi: jnp.ndarray, x_sol: jnp.ndarray,
                  mass: float, eo: bool = False) -> jnp.ndarray:
    """Variational (gradient-exact) form of the pseudofermion action.

        f(theta) = 2 Re<X, phi> - <X, M(theta) X>,   X = stop_grad(M^{-1} phi)

    At the exact solution f = S_pf, and d f / d theta = -X^dag (dM/dtheta) X
    which IS the exact dS_pf/dtheta — so jax.grad through this expression
    (with X held fixed) yields the exact fermion force without
    differentiating the solver. First-order insensitive to CG error in X.
    """
    op = apply_mdagm_eo if eo else apply_mdagm
    xs = jax.lax.stop_gradient(x_sol)
    return (2.0 * jnp.real(_cdot(xs, phi))
            - jnp.real(_cdot(xs, op(theta, xs, mass))))


def dirac_dense(theta: jnp.ndarray, mass: float) -> jnp.ndarray:
    """Dense Wilson operator of ONE configuration as a REAL (2n, 2n) matrix
    (real representation of the complex (n, n) operator, n = 2*L0*L1).

    det(realrep(D)) = |det D|^2 = det(D^dag D), so the dense route gives the
    EXACT two-flavor determinant without complex linear algebra (eager
    complex ops are unsupported on this TPU backend). O(n^2) storage —
    train-lattice scale only (n = 128 at 8^2).
    """
    L0, L1 = theta.shape[-2:]
    n = 2 * L0 * L1
    basis = jnp.eye(n, dtype=jnp.complex64).reshape(n, L0, L1, 2)
    cols = dirac(theta, basis, mass)            # row j = D @ e_j
    D = cols.reshape(n, n).T                     # (rows, cols)
    return jnp.block([[D.real, -D.imag], [D.imag, D.real]])


def logdet_mdagm(theta: jnp.ndarray, mass: float) -> jnp.ndarray:
    """ln det(D^dag D) per configuration — the EXACT two-flavor fermion
    log-determinant, differentiable (slogdet VJP), via the dense real
    representation. theta: (..., 2, L0, L1) -> (...).

    This is the noise-free fermion contribution to the effective action
    S_eff = S_g - ln det(D^dag D): the clean target for fermion-aware
    flow-smoothness training (the round-3 heatbath-force target was too
    noisy — BENCH.md ftschw_b6_negative). Dense: use at the training
    volume (8^2), never in samplers.
    """
    lead = theta.shape[:-3]
    th = theta.reshape((-1,) + theta.shape[-3:])
    _, ld = jnp.linalg.slogdet(jax.vmap(dirac_dense, in_axes=(0, None))(
        th, mass))
    return ld.reshape(lead)


@partial(jax.jit, static_argnames=("mass", "tol", "maxiter", "eo"))
def pf_force(theta: jnp.ndarray, phi: jnp.ndarray, mass: float, *,
             tol: float = 1e-8, maxiter: int = 1000,
             x0: jnp.ndarray | None = None, eo: bool = False):
    """Fermion force dS_pf/dtheta and the CG solution (for warm-starting).

    For a batch, the returned force is the PER-CHAIN gradient (the sum over
    chains of S_pf differentiated, which is blockwise == each chain's own
    gradient since chains don't couple).
    """
    res = cg_solve(theta, phi, mass, x0, tol=tol, maxiter=maxiter, eo=eo)

    def s(th):
        return jnp.sum(pf_action_lin(th, phi, res.x, mass, eo=eo))

    return jax.grad(s)(theta), res.x


@partial(jax.jit, static_argnames=("mass", "n_noise", "tol", "maxiter"))
def chiral_condensate(key: jax.Array, theta: jnp.ndarray, mass: float, *,
                      n_noise: int = 8, tol: float = 1e-8,
                      maxiter: int = 2000) -> jnp.ndarray:
    """Stochastic estimate of <psibar psi> = (1/V) Tr D^{-1} per chain.

    Gaussian noise eta, D^{-1} eta = (D^dag D)^{-1} D^dag eta; averages
    Re<eta, D^{-1} eta> / (V * n_spin) over n_noise vectors.
    """
    vol = theta.shape[-2] * theta.shape[-1] * 2

    def one(k):
        kr, ki = jax.random.split(k)
        shape = theta.shape[:-3] + theta.shape[-2:] + (2,)
        eta = ((jax.random.normal(kr, shape) +
                1j * jax.random.normal(ki, shape)) *
               math.sqrt(0.5)).astype(jnp.complex64)
        rhs = dirac_dag(theta, eta, mass)
        res = cg_solve(theta, rhs, mass, tol=tol, maxiter=maxiter)
        return jnp.real(_cdot(eta, res.x))

    keys = jax.random.split(key, n_noise)
    vals = jax.lax.map(one, keys)
    return jnp.mean(vals, axis=0) / vol


@partial(jax.jit, static_argnames=("mass", "tol", "maxiter"))
def pion_correlator(theta: jnp.ndarray, mass: float, *, tol: float = 1e-10,
                    maxiter: int = 2000) -> jnp.ndarray:
    """Zero-momentum pion correlator C(t) from a point source at the origin.

    The pion interpolator is psibar gamma_5 psi; by gamma_5-hermiticity its
    correlator needs no backward propagator:

        C(t) = sum_{x1, spins} |S(x; 0)|^2,   S = D^{-1} (point source)

    (two spin-column solves via M^{-1} D^dag e_s). Time = axis 0
    (antiperiodic), so C(t) ~ cosh(m_pi (t - L0/2)) at large t. Batched
    theta (B, 2, L0, L1) -> (B, L0); single -> (L0,).
    """
    batched = theta.ndim == 4
    lead = theta.shape[:-3]
    L0, L1 = theta.shape[-2:]

    def col(s):
        src = jnp.zeros(lead + (L0, L1, 2), jnp.complex64)
        src = src.at[..., 0, 0, s].set(1.0 + 0.0j)
        rhs = dirac_dag(theta, src, mass)
        return cg_solve(theta, rhs, mass, tol=tol, maxiter=maxiter).x

    s0, s1 = col(0), col(1)
    dens = (jnp.abs(s0) ** 2 + jnp.abs(s1) ** 2).sum(axis=-1)  # (..., L0, L1)
    return dens.sum(axis=-1)                                    # (..., L0)


# ---------------------------------------------------------------------------
# Hasenbusch mass preconditioning (hep-lat/0107019).
#
# Split the two-flavor determinant with an intermediate HEAVIER mass
# m1 = m + dm (W = D(m1)):
#
#     det(D^dag D) = det(W^dag W) * det(R^{-1}),
#     R = W (D^dag D)^{-1} W^dag,
#
# as two pseudofermion terms
#     S1 = phi1^dag (W^dag W)^{-1} phi1      (heavy: cheap, moderate force)
#     S2 = phi2^dag W (D^dag D)^{-1} W^dag phi2   (ratio: light solve,
#                                                  SMALL force ~ O(dm))
# The ratio force's small magnitude lets it sit on the COARSEST timescale
# of a nested integrator, so the expensive light-mass solves happen only a
# few times per trajectory — the standard production-QCD cost structure.
# S1 reuses pf_action_{exact,lin} at mass m1 (identical form); only the
# ratio term is new. Works on the full operator or the even-odd Schur
# system alike (eo flag, same as everywhere else in this module).
# ---------------------------------------------------------------------------


def _dagger_apply(theta, psi, mass, eo):
    return (dirac_hat_dag if eo else dirac_dag)(theta, psi, mass)


def _apply(theta, psi, mass, eo):
    return (dirac_hat if eo else dirac)(theta, psi, mass)


@partial(jax.jit, static_argnames=("m_light", "m_heavy", "tol", "maxiter",
                                   "eo"))
def hasenbusch_refresh(key: jax.Array, theta: jnp.ndarray, m_light: float,
                       m_heavy: float, *, tol: float = 1e-12,
                       maxiter: int = 1000, eo: bool = False):
    """Heatbath for BOTH Hasenbusch terms at fixed theta.

    phi1 = W^dag chi1            -> S1(start) = chi1^dag chi1 exactly;
    phi2 = W (W^dag W)^{-1} D^dag chi2  (= W^{-dag} D^dag chi2)
                                 -> S2(start) = chi2^dag chi2 exactly
    (one HEAVY solve; no light solve at refresh). Returns
    (phi1, phi2, s0) with s0 = chi1^dag chi1 + chi2^dag chi2 per chain.
    """
    shape = theta.shape[:-3] + theta.shape[-2:] + (2,)
    k1r, k1i, k2r, k2i = jax.random.split(key, 4)
    chi1 = ((jax.random.normal(k1r, shape) +
             1j * jax.random.normal(k1i, shape)) *
            math.sqrt(0.5)).astype(jnp.complex64)
    chi2 = ((jax.random.normal(k2r, shape) +
             1j * jax.random.normal(k2i, shape)) *
            math.sqrt(0.5)).astype(jnp.complex64)
    if eo:
        mask = parity_mask(shape, 0)
        chi1 = chi1 * mask
        chi2 = chi2 * mask
    phi1 = _dagger_apply(theta, chi1, m_heavy, eo)
    rhs = _dagger_apply(theta, chi2, m_light, eo)
    sol = cg_solve(theta, rhs, m_heavy, tol=tol, maxiter=maxiter, eo=eo)
    phi2 = _apply(theta, sol.x, m_heavy, eo)
    s0 = jnp.real(_cdot(chi1, chi1)) + jnp.real(_cdot(chi2, chi2))
    return phi1, phi2, s0


def ratio_action_lin(theta: jnp.ndarray, phi2: jnp.ndarray,
                     y_sol: jnp.ndarray, m_light: float, m_heavy: float,
                     eo: bool = False) -> jnp.ndarray:
    """Variational (gradient-exact) form of the Hasenbusch ratio action

        S2 = b^dag M^{-1} b,  b(theta) = W^dag(theta) phi2,  M = D^dag D:
        f(theta) = 2 Re<Y, b(theta)> - <Y, M(theta) Y>,
        Y = stop_grad(M^{-1} b).

    At the exact solution f = S2 and df/dtheta = dS2/dtheta exactly (both
    the W^dag- and M-dependence are carried); first-order insensitive to
    CG error in Y — same trick as pf_action_lin."""
    op = apply_mdagm_eo if eo else apply_mdagm
    y = jax.lax.stop_gradient(y_sol)
    b = _dagger_apply(theta, phi2, m_heavy, eo)
    return (2.0 * jnp.real(_cdot(y, b))
            - jnp.real(_cdot(y, op(theta, y, m_light))))


def ratio_action_exact(theta: jnp.ndarray, phi2: jnp.ndarray,
                       m_light: float, m_heavy: float, *,
                       tol: float = 1e-12, maxiter: int = 2000,
                       x0: jnp.ndarray | None = None, eo: bool = False):
    """S2 = (W^dag phi2)^dag (D^dag D)^{-1} (W^dag phi2) via a tight LIGHT
    solve (Metropolis-quality). Returns (s2, Y) for warm-starting."""
    b = _dagger_apply(theta, phi2, m_heavy, eo)
    res = cg_solve(theta, b, m_light, x0, tol=tol, maxiter=maxiter, eo=eo)
    return jnp.real(_cdot(b, res.x)), res.x


# ---------------------------------------------------------------------------
# Even-odd (Schur complement) preconditioning.
#
# Site parity p(x) = (x0 + x1) % 2 splits D into
#     D = [[ A_ee, D_eo ], [ D_oe, A_oo ]],   A = (m + 2) * I,
# and det D = det(A_oo) * det(Dhat) with the Schur complement
#     Dhat = (m+2) - D_eo D_oe / (m+2)          (acts on EVEN sites only).
# Since A_oo is a constant, pseudofermions on Dhat simulate the SAME
# det(D)^2 theory with a much better-conditioned solve (measured ~2x fewer
# CG iterations at production parameters - the win that matters on TPU,
# where the sequential while_loop is latency-bound, not FLOP-bound).
#
# TPU-friendly representation: fields stay FULL-SIZE (L0, L1, 2) with the
# odd sites held at zero (masked), so the hop stencils are the same rolls
# as `dirac` and no checkerboard index gymnastics is needed. Dhat maps the
# even subspace to itself; CG run on even-masked vectors IS the half-space
# solve.
# ---------------------------------------------------------------------------


def parity_mask(shape, parity: int = 0) -> jnp.ndarray:
    """(L0, L1, 1) float mask of sites with (x0+x1) % 2 == parity; `shape`
    is the field shape (..., L0, L1, 2)."""
    L0, L1 = shape[-3], shape[-2]
    p = (jnp.arange(L0)[:, None] + jnp.arange(L1)[None, :]) % 2
    return (p == parity).astype(jnp.float32)[..., None]


def _hop(theta: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
    """The Wilson hop sum H psi (so D = (m+2) psi - H psi / 2). Connects
    even <-> odd sites only.

    Half-spinor (spin-projected) transport: in 2D every (1 -+ gamma_mu) is
    RANK ONE, so each direction moves a single complex plane instead of the
    full 2-spinor — p0m psi = (d, -d) with d = s0 - s1, p0p = (e, e),
    p1m = (w, -i w) with w = s0 + i s1, p1p = (v, i v) — halving the roll
    (HBM) traffic of this bandwidth-bound stencil. Same structure as the
    fused Pallas kernel (ops/pallas_fermion._hop_planes); exactness vs the
    textbook projector form is fp32-round-off (tests + A/B)."""
    u0, u1 = _links(theta)
    s0, s1 = psi[..., 0], psi[..., 1]
    d = u0 * jnp.roll(s0 - s1, -1, axis=-2)
    e = jnp.roll(jnp.conj(u0) * (s0 + s1), 1, axis=-2)
    w = u1 * jnp.roll(s0 + 1j * s1, -1, axis=-1)
    v = jnp.roll(jnp.conj(u1) * (s0 - 1j * s1), 1, axis=-1)
    h0 = d + e + w + v
    h1 = -d + e - 1j * w + 1j * v
    return jnp.stack((h0, h1), axis=-1)


def dirac_hat(theta: jnp.ndarray, psi_e: jnp.ndarray,
              mass: float) -> jnp.ndarray:
    """Schur complement Dhat psi_e = (m+2) psi_e - D_eo D_oe psi_e / (m+2)
    on even-masked fields (D_eo D_oe = hop to odd, hop back, / 4)."""
    me = parity_mask(psi_e.shape, 0)
    mo = 1.0 - me
    h = me * _hop(theta, mo * _hop(theta, psi_e))
    return (mass + 2.0) * psi_e - 0.25 / (mass + 2.0) * h


def dirac_hat_dag(theta: jnp.ndarray, psi_e: jnp.ndarray,
                  mass: float) -> jnp.ndarray:
    """Dhat^dag = gamma_5 Dhat gamma_5 (masks commute with gamma_5)."""
    return _g5(dirac_hat(theta, _g5(psi_e), mass))


def apply_mdagm_eo(theta: jnp.ndarray, psi_e: jnp.ndarray,
                   mass: float) -> jnp.ndarray:
    """Mhat psi = Dhat^dag Dhat psi on the even subspace."""
    return dirac_hat_dag(theta, dirac_hat(theta, psi_e, mass), mass)
