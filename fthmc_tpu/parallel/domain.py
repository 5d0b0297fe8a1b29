"""Spatial domain decomposition: lattice sharded over a mesh axis with halo
exchange.

The reference scales volume only by weight reuse on one device (SURVEY.md
section 5 "long-context analogue"). This module adds the true
context-parallelism analogue for lattices beyond one chip's HBM: the L0
(row) axis of the lattice is sharded over a mesh axis; the plaquette/force
stencils need one row of halo from each neighbor, fetched with
jax.lax.ppermute (ICI neighbor exchange - the cheapest possible collective
pattern on a TPU torus).

All functions here are written for use inside jax.shard_map with the lattice
row axis sharded: x_local has shape (B, 2, L0/n, L1) on each device.
``sharded_hmc_step_domain`` assembles a full HMC step; correctness is
validated against the single-device kernel on the CPU test mesh
(tests/test_domain.py).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fthmc_tpu import lattice

__all__ = ["plaq_phase_sharded", "action_sharded", "force_sharded",
           "topo_charge_sharded", "delta_action_sharded", "make_rows_mesh",
           "make_domain_hmc_step", "run_domain_hmc"]


def make_rows_mesh(n_devices: int | None = None, devices=None,
                   axis: str = "rows") -> Mesh:
    """A 1D device mesh over the lattice ROW axis (domain decomposition)."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _neighbor_rows(a: jnp.ndarray, axis_name: str):
    """Fetch halo rows along the sharded row axis (axis -2 of (..., L0loc,
    L1)): returns (row_from_next, row_from_prev) for periodic boundary.

    ppermute with a full ring: device i receives from i+1 its FIRST row
    (completing our roll(-1)), and from i-1 its LAST row (for roll(+1)).
    """
    n = jax.lax.axis_size(axis_name)
    first = a[..., :1, :]
    last = a[..., -1:, :]
    # send our first row to the LEFT neighbor (they need it as their
    # "next" halo): perm maps source->dest, so (i, i-1)
    from_next = jax.lax.ppermute(
        first, axis_name, [(i, (i - 1) % n) for i in range(n)])
    # send our last row to the RIGHT neighbor
    from_prev = jax.lax.ppermute(
        last, axis_name, [(i, (i + 1) % n) for i in range(n)])
    return from_next, from_prev


def _roll_m1_rows(a: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """roll(a, -1, axis=-2) across the sharded row axis."""
    from_next, _ = _neighbor_rows(a, axis_name)
    return jnp.concatenate([a[..., 1:, :], from_next], axis=-2)


def _roll_p1_rows(a: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """roll(a, +1, axis=-2) across the sharded row axis."""
    _, from_prev = _neighbor_rows(a, axis_name)
    return jnp.concatenate([from_prev, a[..., :-1, :]], axis=-2)


def plaq_phase_sharded(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Plaquette phase with the row axis sharded. x: (B, 2, L0loc, L1).

    Same convention as lattice.plaq_phase: P = x0 + roll(x1,-1,row)
    - roll(x0,-1,col) - x1; only the row roll crosses shards.
    """
    x0, x1 = x[:, 0], x[:, 1]
    return (x0
            + _roll_m1_rows(x1, axis_name)
            - jnp.roll(x0, -1, axis=-1)
            - x1)


def action_sharded(x: jnp.ndarray, beta: float, axis_name: str) -> jnp.ndarray:
    """Wilson action per chain, psum-reduced over shards: (B,)."""
    local = jnp.sum(jnp.cos(plaq_phase_sharded(x, axis_name)), axis=(1, 2))
    return -beta * jax.lax.psum(local, axis_name)


def topo_charge_sharded(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Topological charge per chain, psum-reduced: (B,)."""
    p = lattice.wrap(plaq_phase_sharded(x, axis_name))
    return jax.lax.psum(jnp.sum(p, axis=(1, 2)), axis_name) / lattice.TWO_PI


def force_sharded(x: jnp.ndarray, beta: float, axis_name: str) -> jnp.ndarray:
    """Analytic force with halo exchange (same stencil as lattice.force):
      F0 = beta (sinP - roll(sinP,+1,col)),  F1 = beta (roll(sinP,+1,row) - sinP)
    """
    sp = jnp.sin(plaq_phase_sharded(x, axis_name))
    f0 = sp - jnp.roll(sp, 1, axis=-1)
    f1 = _roll_p1_rows(sp, axis_name) - sp
    return beta * jnp.stack((f0, f1), axis=1)


def delta_action_sharded(x1, x0, beta: float, axis_name: str) -> jnp.ndarray:
    """Well-conditioned S(x1)-S(x0) per chain across shards."""
    d = (jnp.cos(plaq_phase_sharded(x1, axis_name))
         - jnp.cos(plaq_phase_sharded(x0, axis_name)))
    return -beta * jax.lax.psum(jnp.sum(d, axis=(1, 2)), axis_name)


def plaq_mean_sharded(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Mean plaquette per chain across shards: (B,)."""
    local = jnp.sum(jnp.cos(plaq_phase_sharded(x, axis_name)), axis=(1, 2))
    n = x.shape[-2] * x.shape[-1] * jax.lax.axis_size(axis_name)
    return jax.lax.psum(local, axis_name) / n


def _domain_hmc_step_local(key, x, q_old, *, beta: float, dt: float,
                           nstep: int, axis: str):
    """One HMC trajectory on the row-sharded field (shard-local program).
    Returns (x', q', metrics dict of (B,) REPLICATED arrays - every metric
    is psum-complete so each shard holds the global value)."""
    kv, ka = jax.random.split(key)
    # per-shard independent momentum: fold the shard index into the key
    idx = jax.lax.axis_index(axis)
    kv = jax.random.fold_in(kv, idx)
    v0 = jax.random.normal(kv, x.shape, x.dtype)

    xx = x + 0.5 * dt * v0
    v = v0

    def body(carry, _):
        xx, v = carry
        v = v - dt * force_sharded(xx, beta, axis)
        xx = xx + dt * v
        return (xx, v), None

    (xx, v), _ = jax.lax.scan(body, (xx, v), None, length=nstep)
    x1 = lattice.wrap(xx - 0.5 * dt * v)

    ds = delta_action_sharded(x1, x, beta, axis)
    dk = 0.5 * jax.lax.psum(
        jnp.sum(((v - v0) * (v + v0)).reshape(x.shape[0], -1), axis=-1),
        axis)
    dh = ds + dk
    # identical accept decision on every shard (same key -> same u)
    u = jax.random.uniform(ka, dh.shape, dh.dtype)
    acc = u < jnp.exp(-dh)
    x_new = jnp.where(acc[:, None, None, None], x1, x)
    q_new = topo_charge_sharded(x_new, axis)
    metrics = {
        "dh": dh, "exp_mdh": jnp.exp(-dh), "acc": acc.astype(x.dtype),
        "plaq": plaq_mean_sharded(x_new, axis), "q": q_new,
        "dq": jnp.abs(q_new - q_old),
    }
    return x_new, q_new, metrics


def make_domain_hmc_step(mesh: Mesh, *, beta: float, dt: float, nstep: int,
                         axis: str = "rows"):
    """Compile a full HMC step with the LATTICE ROW axis sharded over
    `mesh` (chains replicated or additionally sharded by the caller).

    Returns step(key, x, q_old) -> (x', q', (dh, acc)); x must be placed
    with NamedSharding(mesh, P(None, None, axis, None)).
    """
    xspec = P(None, None, axis, None)

    def _step(key, x, q_old):
        x, q, m = _domain_hmc_step_local(key, x, q_old, beta=beta, dt=dt,
                                         nstep=nstep, axis=axis)
        return x, q, (m["dh"], m["acc"])

    shard_fn = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P(), xspec, P()),
        out_specs=(xspec, P(), (P(), P())),
        check_vma=False,
    )
    return jax.jit(shard_fn)


@lru_cache(maxsize=None)
def _domain_hmc_run_fn(mesh: Mesh, axis: str, beta: float, dt: float,
                       nstep: int, ntraj: int):
    """Cached compiled whole-run domain-decomposed HMC: the ntraj scan runs
    INSIDE shard_map (one dispatch for the whole run; collectives per force
    eval ride ICI neighbor ppermutes). Mirrors mesh._hmc_run_fn."""
    xspec = P(None, None, axis, None)
    mspec = {k: P() for k in ("dh", "exp_mdh", "acc", "plaq", "q", "dq")}

    def local(key, x0):
        q0 = topo_charge_sharded(x0, axis)

        def body(carry, k):
            x, q = carry
            x, q, m = _domain_hmc_step_local(k, x, q, beta=beta, dt=dt,
                                             nstep=nstep, axis=axis)
            return (x, q), m

        keys = jax.random.split(key, ntraj)
        (x, _), hist = jax.lax.scan(body, (x0, q0), keys)
        return x, hist

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), xspec), out_specs=(xspec, mspec),
        check_vma=False))


def run_domain_hmc(mesh: Mesh, cfg, *, x0=None, key=None,
                   axis: str = "rows", dtype=jnp.float32):
    """Whole-run production driver for row-sharded (domain-decomposed) HMC:
    cfg.ntraj trajectories as ONE compiled scan, lattice rows sharded over
    `mesh`. For lattices beyond one chip's HBM (the long-context analogue,
    SURVEY.md section 5). Returns (x_final sharded, history dict of
    (ntraj, B) host-convertible arrays - the TrajMetrics fields)."""
    n_dev = mesh.devices.size
    assert cfg.L % n_dev == 0, (cfg.L, n_dev)
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    if x0 is None:
        if cfg.randinit:
            key, k0 = jax.random.split(key)
            x0 = lattice.hot_start(k0, cfg.n_chains, cfg.L, dtype)
        else:
            x0 = jnp.zeros((cfg.n_chains, 2, cfg.L, cfg.L), dtype)
    x0 = jax.device_put(
        x0, NamedSharding(mesh, P(None, None, axis, None)))
    run = _domain_hmc_run_fn(mesh, axis, cfg.beta, cfg.dt, cfg.nstep,
                             cfg.ntraj)
    return run(key, x0)


def run_domain_hmc_chunked(mesh: Mesh, cfg, *, block: int = 256,
                           x0=None, key=None, callback=None,
                           axis: str = "rows", dtype=jnp.float32):
    """Blocked domain-decomposed HMC driver (bounded device-run length —
    the production rule for long runs on this infra; one compile per block
    size via the cached run fn). Returns (x_final sharded, history dict of
    host numpy (ntraj, B) arrays)."""
    import numpy as np
    n_dev = mesh.devices.size
    assert cfg.L % n_dev == 0, (cfg.L, n_dev)
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    if x0 is None:
        if cfg.randinit:
            key, k0 = jax.random.split(key)
            x0 = lattice.hot_start(k0, cfg.n_chains, cfg.L, dtype)
        else:
            x0 = jnp.zeros((cfg.n_chains, 2, cfg.L, cfg.L), dtype)
    x = jax.device_put(x0, NamedSharding(mesh, P(None, None, axis, None)))
    blocks, done = [], 0
    while done < cfg.ntraj:
        n = min(block, cfg.ntraj - done)
        key, krun = jax.random.split(key)
        run = _domain_hmc_run_fn(mesh, axis, cfg.beta, cfg.dt, cfg.nstep, n)
        x, hist = run(krun, x)
        jax.block_until_ready(x)
        blocks.append({k: np.asarray(v) for k, v in hist.items()})
        done += n
        if callback is not None:
            callback(done, blocks[-1])
    cat = {k: np.concatenate([b[k] for b in blocks]) for k in blocks[0]}
    return x, cat
