"""Pallas TPU kernels for the lattice hot path.

Two kernels:

  - `pallas_force`: fused plaquette-phase -> sin -> force stencil, drop-in
    for lattice.batch_force (one VMEM round-trip instead of XLA's
    materialized intermediates).

  - `pallas_leapfrog`: the WHOLE leapfrog trajectory in one kernel. (x, v)
    for a block of chains stay resident in VMEM across all nstep force
    evaluations; HBM sees exactly one read of (x, v) and one write of
    (x', v') per trajectory, vs. the lax.scan path whose per-step loop
    carries go through HBM. This is the memory-bandwidth win that sets the
    leapfrog benchmark (BASELINE.json north star).

The mathematics matches fthmc_tpu.lattice exactly (same plaquette
convention); equivalence is tested against the XLA path in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_force", "pallas_leapfrog", "pallas_leapfrog_cl"]


def _roll(x, shift, axis):
    """Circular shift (pltpu.roll needs a non-negative shift)."""
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _force_of(x, beta):
    """Force stencil on a block (TB, 2, L, L): same math as lattice.force.

    P = x0 + roll(x1,-1,ax1) - roll(x0,-1,ax2) - x1  (axes of the L,L plane)
    F0 = beta * (sinP - roll(sinP,+1,ax2))
    F1 = beta * (roll(sinP,+1,ax1) - sinP)
    """
    x0 = x[:, 0]
    x1 = x[:, 1]
    p = (x0 + _roll(x1, -1, 1) - _roll(x0, -1, 2) - x1)
    sp = jnp.sin(p)
    f0 = sp - _roll(sp, 1, 2)
    f1 = _roll(sp, 1, 1) - sp
    return beta * jnp.stack((f0, f1), axis=1)


def _force_kernel(x_ref, f_ref, *, beta):
    f_ref[:] = _force_of(x_ref[:], beta)


@functools.partial(jax.jit, static_argnames=("beta", "block", "interpret"))
def pallas_force(x: jnp.ndarray, beta: float, block: int = 32,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused gauge force for x: (B, 2, L, L). B must be a multiple of
    `block` (callers pad or pick block=B)."""
    B, two, L, _ = x.shape
    assert two == 2
    block = min(block, B)
    assert B % block == 0, (B, block)
    grid = (B // block,)
    return pl.pallas_call(
        functools.partial(_force_kernel, beta=beta),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((block, 2, L, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, 2, L, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _leapfrog_kernel(x_ref, v_ref, xo_ref, vo_ref, *, beta, dt, nstep):
    """Whole trajectory for one chain block, (x, v) VMEM-resident.

    Same stepping as hmc.leapfrog: half drift, nstep x (kick, drift), then
    undo the trailing half drift.
    """
    x = x_ref[:]
    v = v_ref[:]
    x = x + (0.5 * dt) * v

    def body(_, carry):
        x, v = carry
        v = v - dt * _force_of(x, beta)
        x = x + dt * v
        return (x, v)

    x, v = jax.lax.fori_loop(0, nstep, body, (x, v))
    xo_ref[:] = x - (0.5 * dt) * v
    vo_ref[:] = v


def default_leapfrog_block(L: int, B: int) -> int:
    """Largest power-of-two chain block that fits the ~16 MB scoped-VMEM
    budget. Empirically (v5e, fp32) the kernel needs ~0.75 MB of scoped VMEM
    per chain at L=64 (in/out double buffers + stencil temps), scaling with
    L^2 -> ~12 MB budget / (0.75 MB * (L/64)^2)."""
    per_chain = 0.75 * (L * L) / (64 * 64)  # MB
    block = int(12.0 / per_chain)
    p = 1
    while p * 2 <= min(block, B, 256):
        p *= 2
    return p


@functools.partial(jax.jit,
                   static_argnames=("beta", "dt", "nstep", "block",
                                    "interpret"))
def pallas_leapfrog(x: jnp.ndarray, v: jnp.ndarray, *, beta: float,
                    dt: float, nstep: int, block: int | None = None,
                    interpret: bool = False):
    """Full leapfrog trajectory for (B, 2, L, L) chains in one kernel.
    Returns (x', v')."""
    B, two, L, _ = x.shape
    assert two == 2
    if block is None:
        block = default_leapfrog_block(L, B)
    block = min(block, B)
    assert B % block == 0, (B, block)
    grid = (B // block,)
    spec = pl.BlockSpec((block, 2, L, L), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_leapfrog_kernel, beta=beta, dt=dt, nstep=nstep),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        # in-place update: halves the scoped-VMEM footprint (x/v blocks are
        # both read and written by every grid step)
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=nstep * B * L * L * 30,
            bytes_accessed=2 * 2 * B * 2 * L * L * 4,
            transcendentals=nstep * B * L * L,
        ),
    )(x, v)


# ---------------------------------------------------------------------------
# chains-last layout: lattice rolls never touch the lane axis
# ---------------------------------------------------------------------------

def _force_of_cl(x, beta):
    """Force stencil in chains-last layout (2, L, L, TB): the lane axis is
    the chain block, so the periodic shifts act on sublane axes only - far
    cheaper on the VPU than lane rotations."""
    x0 = x[0]
    x1 = x[1]
    p = (x0 + _roll(x1, -1, 0) - _roll(x0, -1, 1) - x1)
    sp = jnp.sin(p)
    f0 = sp - _roll(sp, 1, 1)
    f1 = _roll(sp, 1, 0) - sp
    return beta * jnp.stack((f0, f1), axis=0)


def _leapfrog_cl_kernel(x_ref, v_ref, xo_ref, vo_ref, *, beta, dt, nstep):
    x = x_ref[0]          # block (1, 2, L, L, TB) -> (2, L, L, TB)
    v = v_ref[0]
    x = x + (0.5 * dt) * v

    def body(_, carry):
        x, v = carry
        v = v - dt * _force_of_cl(x, beta)
        x = x + dt * v
        return (x, v)

    x, v = jax.lax.fori_loop(0, nstep, body, (x, v))
    xo_ref[0] = x - (0.5 * dt) * v
    vo_ref[0] = v


@functools.partial(jax.jit,
                   static_argnames=("beta", "dt", "nstep", "block",
                                    "interpret"))
def pallas_leapfrog_cl(x: jnp.ndarray, v: jnp.ndarray, *, beta: float,
                       dt: float, nstep: int, block: int = 128,
                       interpret: bool = False):
    """Whole-trajectory leapfrog with chains-last VMEM layout.

    Takes/returns the framework-standard (B, 2, L, L); transposes to
    (2, L, L, B) at the HBM boundary (amortized over all nstep steps). The
    chain block rides the 128-wide lane axis; periodic rolls act on sublane
    axes only.
    """
    B, two, L, _ = x.shape
    assert two == 2
    block = min(block, B)
    assert B % block == 0, (B, block)
    # VMEM blocks are lane-padded to 128, so a smaller chain block saves
    # nothing - the layout only pays off with the full 128 lanes, which
    # bounds the lattice size (scoped VMEM ~ 5 buffers of (2, L, L, 128)).
    assert 2 * L * L * 128 * 4 * 5 <= 15 * 2**20, (
        f"L={L} too large for the chains-last VMEM-resident kernel; "
        "use pallas_leapfrog (chains-first) instead")
    xt = jnp.transpose(x, (1, 2, 3, 0))
    vt = jnp.transpose(v, (1, 2, 3, 0))
    grid = (B // block,)
    spec = pl.BlockSpec((1, 2, L, L, block), lambda i: (i, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    xb = xt.reshape(2, L, L, B // block, block).transpose(3, 0, 1, 2, 4)
    vb = vt.reshape(2, L, L, B // block, block).transpose(3, 0, 1, 2, 4)
    xo, vo = pl.pallas_call(
        functools.partial(_leapfrog_cl_kernel, beta=beta, dt=dt,
                          nstep=nstep),
        out_shape=(jax.ShapeDtypeStruct(xb.shape, x.dtype),
                   jax.ShapeDtypeStruct(vb.shape, v.dtype)),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(xb, vb)
    xo = xo.transpose(1, 2, 3, 0, 4).reshape(2, L, L, B)
    vo = vo.transpose(1, 2, 3, 0, 4).reshape(2, L, L, B)
    return (jnp.transpose(xo, (3, 0, 1, 2)),
            jnp.transpose(vo, (3, 0, 1, 2)))


# ---------------------------------------------------------------------------
# Fully-fused HMC trajectory: momentum refresh (in-kernel RNG), leapfrog,
# energy accounting, and the Metropolis accept all inside one kernel.
# HBM sees ONE read of x and ONE write of (x', dh, acc) per trajectory -
# the lax.scan path additionally materializes v0 (RNG), wrap, the energy
# reductions and the accept-select, ~3x the HBM traffic at nstep=10.
# RNG: pltpu PRNG seeded per (seed, block); Box-Muller gaussians for the
# refresh, 24-bit uniforms for the accept draw. Streams differ from
# jax.random by construction - validation is statistical (BENCH.md).
# ---------------------------------------------------------------------------

_INV24 = float(2.0 ** -24)


def _uniform_from_bits(bits):
    """random bits -> (0, 1] uniforms with 24-bit resolution (never 0, so
    log(u) is finite for Box-Muller). pltpu.prng_random_bits returns SIGNED
    int32 on TPU - bitcast to uint32 first or the shift is arithmetic and
    half the "uniforms" come out negative."""
    masked = jnp.bitwise_and(bits, jnp.int32(0x7FFFFFFF)) >> 7
    return masked.astype(jnp.float32) * _INV24 + _INV24


def _gaussians(shape):
    """Standard normals via Box-Muller from the seeded in-kernel PRNG."""
    u1 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    u2 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def _wilson_cos(x):
    """cos(plaquette phase) on a block (TB, 2, L, L) -> (TB, L, L)."""
    x0 = x[:, 0]
    x1 = x[:, 1]
    p = (x0 + _roll(x1, -1, 1) - _roll(x0, -1, 2) - x1)
    return jnp.cos(p)


def _hmc_traj_kernel(seed_ref, x_ref, xo_ref, dh_ref, acc_ref,
                     *, beta, dt, nstep):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], i)
    x0 = x_ref[:]
    TB = x0.shape[0]
    v0 = _gaussians(x0.shape)
    u2 = _uniform_from_bits(pltpu.prng_random_bits((TB, 128)))[:, 0:1]
    x_new, dh2, acc2 = _hmc_traj_body(x0, v0, u2, beta=beta, dt=dt,
                                      nstep=nstep)
    xo_ref[:] = x_new
    dh_ref[:] = dh2
    acc_ref[:] = acc2.astype(x0.dtype)


@functools.partial(jax.jit,
                   static_argnames=("beta", "dt", "nstep", "block",
                                    "interpret"))
def pallas_hmc_traj(x: jnp.ndarray, seed: jnp.ndarray, *, beta: float,
                    dt: float, nstep: int, block: int | None = None,
                    interpret: bool = False):
    """One fully-fused batched HMC trajectory. x: (B, 2, L, L); seed: int32
    scalar (one fresh value per trajectory). Returns (x_new, dh, acc)."""
    B, two, L, _ = x.shape
    assert two == 2
    if block is None:
        block = default_leapfrog_block(L, B)
    block = min(block, B)
    assert B % block == 0, (B, block)
    grid = (B // block,)
    xspec = pl.BlockSpec((block, 2, L, L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    x_new, dh2, acc2 = pl.pallas_call(
        functools.partial(_hmc_traj_kernel, beta=beta, dt=dt, nstep=nstep),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((B, 1), x.dtype),
                   jax.ShapeDtypeStruct((B, 1), x.dtype)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), xspec],
        out_specs=(xspec, cspec, cspec),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), x)
    return x_new, dh2[:, 0], acc2[:, 0]


def _hmc_traj_body(x0, v0, u2, *, beta, dt, nstep):
    """Shared trajectory + energy + Metropolis body (block arrays in VMEM).

    u2: (TB, 1) accept uniforms. Everything per-chain stays 2D (TB, 1) -
    Mosaic's vector layouts reject 1D intermediates and shape casts.
    """
    cos0 = _wilson_cos(x0)
    x = x0 + (0.5 * dt) * v0
    v = v0

    def body(_, carry):
        x, v = carry
        v = v - dt * _force_of(x, beta)
        x = x + dt * v
        return (x, v)

    x, v = jax.lax.fori_loop(0, nstep, body, (x, v))
    x1 = x - (0.5 * dt) * v
    v1 = v

    # stepwise reductions ending in a keepdims -> (TB, 1): Mosaic rejects
    # multi-axis keepdims + slice and any 1D intermediate
    cdiff = _wilson_cos(x1) - cos0
    dsw = jnp.sum(jnp.sum(cdiff, axis=2), axis=1, keepdims=True)  # (TB, 1)
    kin = (v1 - v0) * (v1 + v0)
    dk = jnp.sum(jnp.sum(jnp.sum(kin, axis=3), axis=2), axis=1,
                 keepdims=True)                                   # (TB, 1)
    dh2 = -beta * dsw + 0.5 * dk
    acc2 = u2 < jnp.exp(-dh2)                                   # (TB, 1)
    pi = jnp.float32(jnp.pi)
    x1w = jnp.remainder(x1 + pi, 2.0 * pi) - pi
    x_new = jnp.where(acc2[:, :, None, None], x1w, x0)
    return x_new, dh2, acc2


def _hmc_traj_hostrng_kernel(x_ref, v_ref, u_ref, xo_ref, dh_ref, acc_ref,
                             *, beta, dt, nstep):
    x_new, dh2, acc2 = _hmc_traj_body(x_ref[:], v_ref[:], u_ref[:],
                                      beta=beta, dt=dt, nstep=nstep)
    xo_ref[:] = x_new
    dh_ref[:] = dh2
    acc_ref[:] = acc2.astype(x_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("beta", "dt", "nstep", "block",
                                    "interpret"))
def pallas_hmc_traj_hostrng(x: jnp.ndarray, v0: jnp.ndarray, u: jnp.ndarray,
                            *, beta: float, dt: float, nstep: int,
                            block: int | None = None,
                            interpret: bool = False):
    """Fused trajectory + energy + Metropolis with CALLER-supplied momentum
    v0 and accept draws u (B,). Bitwise-comparable to hmc.hmc_step given the
    same draws; also the interpret-mode test surface for the fused kernel
    (in-kernel PRNG has no interpret lowering)."""
    B, two, L, _ = x.shape
    assert two == 2
    if block is None:
        block = default_leapfrog_block(L, B)
    block = min(block, B)
    assert B % block == 0, (B, block)
    grid = (B // block,)
    xspec = pl.BlockSpec((block, 2, L, L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    x_new, dh2, acc2 = pl.pallas_call(
        functools.partial(_hmc_traj_hostrng_kernel, beta=beta, dt=dt,
                          nstep=nstep),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((B, 1), x.dtype),
                   jax.ShapeDtypeStruct((B, 1), x.dtype)),
        grid=grid,
        in_specs=[xspec, xspec, cspec],
        out_specs=(xspec, cspec, cspec),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(x, v0, u.reshape(B, 1))
    return x_new, dh2[:, 0], acc2[:, 0]
