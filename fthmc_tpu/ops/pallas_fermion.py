"""Fused Pallas TPU kernel for the Wilson-Dirac normal operator.

Motivation (measured, BENCH.md round-3 "CG cost structure"): the XLA
roll-stencil formulation of `fermion.apply_mdagm_eo` costs ~1.8 ms per CG
iteration at 64^2/B=64 while its ideal HBM traffic (read psi + read links +
write out ~ 13 MB) is ~15x smaller — every one of the ~32 rolls and the
projector stacks materializes an intermediate in HBM. This kernel applies
the WHOLE even-odd Schur normal operator Mhat = Dhat^dag Dhat (four Wilson
hops, parity masks, gamma_5 twists) in one VMEM-resident pass per chain
block, so HBM sees exactly one read of (psi, links) and one write of the
result.

Layout: the packed REAL representation (B, 4, L0, L1) float32 with planes
[Re s0, Im s0, Re s1, Im s1]. Complex CG on a hermitian positive-definite
operator is exactly real CG on the realified system, so `cg_solve_fused`
below keeps every vector op (axpy, dots, convergence masks) in this packed
layout and complex numbers only appear in the in-kernel link multiplies
(done in explicit real arithmetic — Mosaic has no complex support).
Chains-first blocks (block, 4, L0, L1): lattice rolls ride the
sublane/lane axes, the proven layout of ops/pallas_lattice.py at L >= 48.

Mathematics matches fthmc_tpu.fermion exactly (same conventions:
gamma_0 = sigma_x, gamma_1 = sigma_y, antiperiodic time folded into the
time-direction links; see fermion.py docstring, reference has no fermions
— this whole subsystem is beyond nftqcd/fthmc). Equivalence is tested in
tests/test_pallas_fermion.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_spinor", "unpack_spinor", "link_planes",
           "pallas_mdagm", "cg_solve_fused", "default_fermion_block",
           "fused_cg_supported", "fused_cl_supported", "normal_op_planes"]


def _roll(x, shift, axis):
    """Circular shift (pltpu.roll needs a non-negative shift)."""
    return pltpu.roll(x, shift % x.shape[axis], axis)


# ---------------------------------------------------------------------------
# packing helpers (XLA side, once per solve — not per iteration)
# ---------------------------------------------------------------------------


def pack_spinor(psi: jnp.ndarray) -> jnp.ndarray:
    """Complex spinor field (..., L0, L1, 2) -> packed (..., 4, L0, L1) f32
    with planes [Re s0, Im s0, Re s1, Im s1]."""
    s0, s1 = psi[..., 0], psi[..., 1]
    return jnp.stack((jnp.real(s0), jnp.imag(s0),
                      jnp.real(s1), jnp.imag(s1)), axis=-3)


def unpack_spinor(p4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_spinor: (..., 4, L0, L1) f32 -> (..., L0, L1, 2) c64."""
    s0 = jax.lax.complex(p4[..., 0, :, :], p4[..., 1, :, :])
    s1 = jax.lax.complex(p4[..., 2, :, :], p4[..., 3, :, :])
    return jnp.stack((s0, s1), axis=-1)


def link_planes(theta: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(ur, ui) real/imag link planes, each (..., 2, L0, L1) f32, with the
    antiperiodic time boundary folded into direction 0's last time slice
    (same convention as fermion._links)."""
    th = theta.astype(jnp.float32)
    ur, ui = jnp.cos(th), jnp.sin(th)
    L0 = theta.shape[-2]
    sign = jnp.where(jnp.arange(L0) == L0 - 1, -1.0, 1.0)[:, None]
    dir_sign = jnp.stack((sign, jnp.ones_like(sign)))  # (2, L0, 1)
    return ur * dir_sign, ui * dir_sign


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _hop_planes(ur0, ui0, ur1, ui1, s0r, s0i, s1r, s1i, roll=None):
    """Wilson hop H psi on packed planes (each (TB, L0, L1)); returns the
    four result planes. Per direction: one complex combine + one complex
    multiply + one two-plane roll (the projector structure p0m=(d,-d),
    p0p=(e,e), p1m=(w,-iw), p1p=(v,iv) lets each direction touch a single
    complex field).

    ``roll(x, shift, axis)`` defaults to the in-kernel pltpu roll; the
    XLA-side mixed-precision CG (fermion._plane_mdagm) reuses this exact
    stencil with jnp.roll, so the math has a single source."""
    _roll = roll or globals()["_roll"]
    # forward 0: u0 * roll(psi,-1,x0), projector (1 - g0): (d, -d), d = t0-t1
    t0r, t0i = _roll(s0r, -1, 1), _roll(s0i, -1, 1)
    t1r, t1i = _roll(s1r, -1, 1), _roll(s1i, -1, 1)
    dr, di = t0r - t1r, t0i - t1i
    mr = ur0 * dr - ui0 * di
    mi = ur0 * di + ui0 * dr
    h0r, h0i, h1r, h1i = mr, mi, -mr, -mi

    # backward 0: roll(conj(u0) * psi, +1, x0), projector (1 + g0): (e, e)
    er, ei = s0r + s1r, s0i + s1i
    mr = ur0 * er + ui0 * ei
    mi = ur0 * ei - ui0 * er
    rr, ri = _roll(mr, 1, 1), _roll(mi, 1, 1)
    h0r += rr
    h0i += ri
    h1r += rr
    h1i += ri

    # forward 1: u1 * roll(psi,-1,x1), projector (1 - g1): (w, -i w),
    # w = t0 + i t1
    t0r, t0i = _roll(s0r, -1, 2), _roll(s0i, -1, 2)
    t1r, t1i = _roll(s1r, -1, 2), _roll(s1i, -1, 2)
    wr, wi = t0r - t1i, t0i + t1r
    mr = ur1 * wr - ui1 * wi
    mi = ur1 * wi + ui1 * wr
    h0r += mr
    h0i += mi
    h1r += mi          # -i m = (Im m, -Re m)
    h1i += -mr

    # backward 1: roll(conj(u1) * psi, +1, x1), projector (1 + g1): (v, i v),
    # v = s0 - i s1
    vr, vi = s0r + s1i, s0i - s1r
    mr = ur1 * vr + ui1 * vi
    mi = ur1 * vi - ui1 * vr
    rr, ri = _roll(mr, 1, 2), _roll(mi, 1, 2)
    h0r += rr
    h0i += ri
    h1r += -ri         # i r = (-Im r, Re r)
    h1i += rr
    return h0r, h0i, h1r, h1i


def normal_op_planes(hop, s, mass, eo, even, odd):
    """Compose the normal operator (D^dag D, or the even-odd Schur
    Mhat = Dhat^dag Dhat) from a hop closure on 4 packed planes. The
    SINGLE SOURCE of the operator composition: both kernel layouts and
    the XLA-side mixed-precision CG (fermion._plane_mdagm) call this.
    `even`/`odd` are parity-mask arrays broadcastable against the planes
    (ignored when eo=False)."""
    a = mass + 2.0
    if eo:
        b = 0.25 / a

        def dhat(s):
            h = hop(s)
            h = hop(tuple(odd * c for c in h))
            return tuple(a * si - b * even * hi for si, hi in zip(s, h))
    else:
        def dhat(s):
            h = hop(s)
            return tuple(a * si - 0.5 * hi for si, hi in zip(s, h))

    def dhat_dag(s):
        # g5 D g5: g5 negates the second spinor component's planes
        r = dhat((s[0], s[1], -s[2], -s[3]))
        return (r[0], r[1], -r[2], -r[3])

    return dhat_dag(dhat(s))


def _parity_masks(L0, L1, trailing):
    """(even, odd) f32 masks of shape (L0, L1) + (1,)*trailing."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (L0, L1), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (L0, L1), 1)
    even = (((i0 + i1) % 2) == 0).astype(jnp.float32)
    even = even.reshape((L0, L1) + (1,) * trailing)
    return even, 1.0 - even


def _mdagm_kernel(ur_ref, ui_ref, p_ref, o_ref, *, mass, eo):
    """out = Dhat^dag Dhat psi (eo=True) or D^dag D psi (eo=False) on one
    chains-FIRST block (TB, 4, L0, L1), entirely in VMEM."""
    ur0, ur1 = ur_ref[:, 0], ur_ref[:, 1]
    ui0, ui1 = ui_ref[:, 0], ui_ref[:, 1]
    L0, L1 = p_ref.shape[-2], p_ref.shape[-1]
    even, odd = _parity_masks(L0, L1, 0)

    def hop(s):
        return _hop_planes(ur0, ui0, ur1, ui1, *s)

    m = normal_op_planes(hop, (p_ref[:, 0], p_ref[:, 1], p_ref[:, 2],
                               p_ref[:, 3]), mass, eo, even[None],
                         odd[None])
    o_ref[:] = jnp.stack(m, axis=1)


def _mdagm_cl_kernel(ur_ref, ui_ref, p_ref, o_ref, *, mass, eo):
    """Chains-LAST layout: planes are (L0, L1, TB) with the chain block on
    the 128-wide lane axis, so the lattice rolls act on sublane/untiled
    axes only and small lattices (L < 32) waste no lanes — the
    pallas_lattice.py chains-last lesson applied to the Dirac operator.
    Block shapes: ur/ui (2, L0, L1, TB), p/o (4, L0, L1, TB)."""
    ur0, ur1 = ur_ref[0], ur_ref[1]
    ui0, ui1 = ui_ref[0], ui_ref[1]
    L0, L1 = p_ref.shape[1], p_ref.shape[2]
    even, odd = _parity_masks(L0, L1, 1)

    def roll_cl(x, shift, axis):
        return _roll(x, shift, axis - 1)   # hop's (TB,L0,L1) axes 1,2 -> 0,1

    def hop(s):
        return _hop_planes(ur0, ui0, ur1, ui1, *s, roll=roll_cl)

    m = normal_op_planes(hop, (p_ref[0], p_ref[1], p_ref[2], p_ref[3]),
                         mass, eo, even, odd)
    o_ref[:] = jnp.stack(m, axis=0)


def default_fermion_block(L: int, B: int) -> int:
    """Largest power-of-two chain block keeping the kernel's VMEM footprint
    ~<= 12 MB (~20 active (L, L) f32 planes per chain: psi in/out, 4 link
    planes, hop temps; lane padding to 128 included for L < 128)."""
    lanes = max(L, 128)
    per_chain = 20 * L * lanes * 4 / 1e6  # MB
    block = max(1, int(12.0 / per_chain))
    p = 1
    while p * 2 <= min(block, B):
        p *= 2
    return p


def fused_cg_supported(L0: int, L1: int) -> bool:
    """Envelope where the chains-FIRST kernel is expected to help AND
    compile fast: square-ish lattices with lane dim >= 32 (Mosaic compiles
    pathologically slowly at tiny tiled dims — round-2 lesson), even sides
    (checkerboard parity must tile)."""
    return L1 >= 32 and L0 >= 8 and L0 % 2 == 0 and L1 % 2 == 0


def fused_cl_supported(L0: int, L1: int) -> bool:
    """Envelope of the chains-LAST kernel: the whole 128-lane chain block
    must fit ~24 (L0, L1, 128) f32 planes in scoped VMEM (~<= 13 MB), i.e.
    L <= 32; even sides for the parity tiling. Complements
    fused_cg_supported — together every even lattice has a fused path."""
    return (L0 % 2 == 0 and L1 % 2 == 0 and L0 >= 4 and L1 >= 4
            and 24 * L0 * L1 * 128 * 4 <= 13 * 2**20)


@functools.partial(jax.jit,
                   static_argnames=("mass", "eo", "block", "interpret",
                                    "layout"))
def pallas_mdagm(theta: jnp.ndarray, psi: jnp.ndarray, mass: float, *,
                 eo: bool = True, block: int | None = None,
                 interpret: bool = False,
                 layout: str = "cf") -> jnp.ndarray:
    """Drop-in fused replacement for fermion.apply_mdagm[_eo] (complex
    boundary: packs, runs the kernel, unpacks). For the CG hot loop use
    cg_solve_fused, which stays packed across iterations. layout: 'cf'
    (chains-first) or 'cl' (chains-last, small lattices)."""
    squeeze = psi.ndim == 3
    if squeeze:
        theta, psi = theta[None], psi[None]
    ur, ui = link_planes(theta)
    p4 = pack_spinor(psi)
    if layout == "cl":
        out = _mdagm_call_cl(jnp.moveaxis(ur, 0, -1),
                             jnp.moveaxis(ui, 0, -1),
                             jnp.moveaxis(p4, 0, -1), mass, eo, block,
                             interpret)
        out = jnp.moveaxis(out, -1, 0)
    else:
        out = _mdagm_call(ur, ui, p4, mass, eo, block, interpret)
    res = unpack_spinor(out)
    return res[0] if squeeze else res


def _mdagm_call(ur, ui, p4, mass, eo, block, interpret):
    B, _, L0, L1 = p4.shape
    if block is None:
        block = default_fermion_block(max(L0, L1), B)
    while B % block:
        block //= 2
    grid = (B // block,)
    uspec = pl.BlockSpec((block, 2, L0, L1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((block, 4, L0, L1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mdagm_kernel, mass=mass, eo=eo),
        grid=grid,
        in_specs=[uspec, uspec, pspec],
        out_specs=pspec,
        out_shape=jax.ShapeDtypeStruct(p4.shape, jnp.float32),
        interpret=interpret,
    )(ur, ui, p4)


def _mdagm_call_cl(urt, uit, p4t, mass, eo, block, interpret):
    """Chains-last call: urt/uit (2, L0, L1, B), p4t (4, L0, L1, B)."""
    _, L0, L1, B = p4t.shape
    block = min(128, B) if block is None else min(block, B)
    while B % block:
        block //= 2
    grid = (B // block,)
    uspec = pl.BlockSpec((2, L0, L1, block), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((4, L0, L1, block), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mdagm_cl_kernel, mass=mass, eo=eo),
        grid=grid,
        in_specs=[uspec, uspec, pspec],
        out_specs=pspec,
        out_shape=jax.ShapeDtypeStruct(p4t.shape, jnp.float32),
        interpret=interpret,
    )(urt, uit, p4t)


# ---------------------------------------------------------------------------
# CG on the packed representation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("mass", "tol", "maxiter", "eo",
                                             "block", "interpret", "layout"))
def cg_solve_fused(theta: jnp.ndarray, b: jnp.ndarray, mass: float,
                   x0: jnp.ndarray | None = None, *, tol: float = 1e-8,
                   maxiter: int = 1000, eo: bool = True,
                   block: int | None = None, interpret: bool = False,
                   layout: str = "auto"):
    """Batched CG for (D^dag D) x = b with the fused Pallas operator.

    Same semantics as fermion.cg_solve (complex in/out, per-chain
    convergence freezing, tol on |r|^2/|b|^2) but the operator is ONE
    VMEM-resident kernel and every vector op runs on the packed f32
    representation — complex CG on a hermitian PD operator IS real CG on
    the realified system, so <.,.> reductions become plain f32 sums.

    `layout`: 'cf' (chains-first blocks — large lattices), 'cl'
    (chains-last, chain block on the lane axis — small lattices), or
    'auto' (cl where supported and L1 < 32, else cf). Transposes happen
    once per solve at the HBM boundary, not per iteration.
    Returns fermion.CGResult."""
    from fthmc_tpu.fermion import CGResult

    squeeze = b.ndim == 3
    if squeeze:
        theta, b = theta[None], b[None]
        x0 = None if x0 is None else x0[None]
    L0, L1 = theta.shape[-2], theta.shape[-1]
    if layout == "auto":
        layout = "cl" if (fused_cl_supported(L0, L1)
                          and not fused_cg_supported(L0, L1)) else "cf"

    ur, ui = link_planes(theta)
    if layout == "cl":
        ur, ui = (jnp.moveaxis(ur, 0, -1), jnp.moveaxis(ui, 0, -1))

        def pack(c):
            return jnp.moveaxis(pack_spinor(c), 0, -1)

        def unpack(p):
            return unpack_spinor(jnp.moveaxis(p, -1, 0))

        def op(v):
            return _mdagm_call_cl(ur, ui, v, mass, eo, block, interpret)

        def dot(u, v):
            return jnp.sum(u * v, axis=(0, 1, 2))

        def bcast(a):
            return a[None, None, None, :]
    else:
        def pack(c):
            return pack_spinor(c)

        def unpack(p):
            return unpack_spinor(p)

        def op(v):
            return _mdagm_call(ur, ui, v, mass, eo, block, interpret)

        def dot(u, v):
            return jnp.sum(u * v, axis=(1, 2, 3))

        def bcast(a):
            return a[:, None, None, None]

    b4 = pack(b)
    bsq = dot(b4, b4)
    stop = tol * bsq
    x = jnp.zeros_like(b4) if x0 is None else pack(x0)
    r = b4 - op(x)
    p = r
    rsq = dot(r, r)

    def cond(carry):
        x, r, p, rsq, k = carry
        return jnp.logical_and(jnp.any(rsq > stop), k < maxiter)

    def body(carry):
        x, r, p, rsq, k = carry
        active = rsq > stop
        mp = op(p)
        denom = dot(p, mp)
        alpha = jnp.where(active, rsq / jnp.maximum(denom, 1e-30), 0.0)
        al = bcast(alpha)
        x = x + al * p
        r = r - al * mp
        rsq_new = dot(r, r)
        beta = jnp.where(active, rsq_new / jnp.maximum(rsq, 1e-30), 0.0)
        p = r + bcast(beta) * p
        rsq = jnp.where(active, rsq_new, rsq)
        return (x, r, p, rsq, k + 1)

    x, r, p, rsq, k = jax.lax.while_loop(cond, body, (x, r, p, rsq, 0))
    sol = unpack(x)
    rel = rsq / jnp.maximum(bsq, 1e-30)
    if squeeze:
        sol, rel = sol[0], rel[0]
    return CGResult(sol, k, rel)
