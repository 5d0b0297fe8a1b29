"""Domain-decomposed gauge-equivariant flow + FT-HMC.

Extends parallel/domain.py (row-sharded lattice, halo exchange) to the full
flow: the coupling-layer CNNs exchange one halo row per conv via ppermute,
stripe masks are sliced per shard from the global constants, and the FT-HMC
force is jax.grad through the sharded flow INSIDE shard_map (psum transposes
handle the cross-shard terms). This makes flowed HMC run on lattices larger
than one chip's HBM - a capability with no counterpart in the reference
(single-device only; SURVEY.md section 2b).

Layout contract: inside shard_map, fields are (B, 2, L0/n, L1) with the row
axis sharded over `axis_name`; flow params are replicated.

The reverse (bisection) path is intentionally not sharded yet: it is off the
hot loop (only used to enter latent space from a physical config); do that
on one device or gather first.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fthmc_tpu import lattice
from fthmc_tpu.config import FlowSpec
from fthmc_tpu.models.coupling import (plaq_transform_apply, stack_cos_sin,
                                       wrap_pi)
from fthmc_tpu.models.masks import (layer_mask_params, link_active_stripes,
                                    plaq_masks)
from fthmc_tpu.ops.conv import ACTIVATIONS
from fthmc_tpu.parallel.domain import (plaq_phase_sharded,
                                       topo_charge_sharded)

__all__ = ["flow_forward_sharded", "ft_action_sharded", "ft_force_sharded",
           "make_domain_fthmc_step", "run_domain_fthmc",
           "run_domain_fthmc_chunked"]


def _halo_rows(a: jnp.ndarray, p: int, axis_name: str):
    """Fetch p halo rows from each neighbor along the sharded row axis
    (axis -2). Returns (top_from_prev, bottom_from_next)."""
    n = lax.axis_size(axis_name)
    top = a[..., :p, :]      # our first rows -> previous neighbor's bottom
    bot = a[..., -p:, :]     # our last rows  -> next neighbor's top
    from_next = lax.ppermute(top, axis_name,
                             [(i, (i - 1) % n) for i in range(n)])
    from_prev = lax.ppermute(bot, axis_name,
                             [(i, (i + 1) % n) for i in range(n)])
    return from_prev, from_next


def circular_conv2d_sharded(x, w, b, axis_name: str):
    """Periodic conv with the row axis sharded: columns wrap-pad locally,
    rows get k//2 halo rows from each neighbor. x: (B, Cin, L0loc, L1)."""
    k = w.shape[-1]
    p = k // 2
    from_prev, from_next = _halo_rows(x, p, axis_name)
    xr = jnp.concatenate([from_prev, x, from_next], axis=-2)
    xp = jnp.pad(xr, ((0, 0), (0, 0), (0, 0), (p, p)), mode="wrap")
    y = lax.conv_general_dilated(
        xp, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=x.dtype)
    return y + b[None, :, None, None]


def _conv_net_apply_sharded(params, x, activation: str, axis_name: str):
    act = ACTIVATIONS[activation]
    n = len(params)
    for i, pdict in enumerate(params):
        x = circular_conv2d_sharded(x, pdict["w"], pdict["b"], axis_name)
        if i != n - 1:
            x = act(x)
    return x


def _local_masks(full_shape, mu, off, rows_local: int, axis_name: str,
                 dtype):
    """Slice the global stripe masks to this shard's row block."""
    idx = lax.axis_index(axis_name)
    start = idx * rows_local
    frozen, active, passive = (jnp.asarray(m, dtype)
                               for m in plaq_masks(full_shape, mu, off))
    sl = lambda m: lax.dynamic_slice_in_dim(m, start, rows_local, axis=0)
    return sl(frozen), sl(active), sl(passive)


def _local_link_mask(full_shape, mu, off, rows_local: int, axis_name: str,
                     dtype):
    idx = lax.axis_index(axis_name)
    start = idx * rows_local
    m = jnp.asarray(link_active_stripes(full_shape, mu, off), dtype)
    return lax.dynamic_slice_in_dim(m, start, rows_local, axis=1)


def _link_coupling_forward_sharded(net_params, x, mu, off, spec: FlowSpec,
                                   L0: int, axis_name: str):
    """One gauge-equivariant coupling with the row axis sharded.
    x: (B, 2, L0loc, L1) -> (fx, logJ_local (B,))."""
    B, _, l0loc, L1 = x.shape
    frozen, active, passive = _local_masks((L0, L1), mu, off, l0loc,
                                           axis_name, x.dtype)
    plaq = plaq_phase_sharded(x, axis_name)

    net_out = _conv_net_apply_sharded(
        net_params, stack_cos_sin(frozen * plaq), spec.activation,
        axis_name)
    fx1, local_logJ, t = plaq_transform_apply(net_out, plaq, active, spec)
    logJ = jnp.sum(local_logJ, axis=(1, 2))  # psum'd by the caller
    new_plaq = active * wrap_pi(fx1 + t) + passive * plaq + frozen * plaq

    delta_plaq = new_plaq - plaq
    delta_links = jnp.stack((delta_plaq, -delta_plaq), axis=1)
    active_links = _local_link_mask((2, L0, L1), mu, off, l0loc, axis_name,
                                    x.dtype)
    fx = (active_links * wrap_pi(delta_links + x)
          + (1.0 - active_links) * x)
    return fx, logJ


def flow_forward_sharded(params, x, spec: FlowSpec, L0: int,
                         axis_name: str, remat: bool = True,
                         reduce: bool = True):
    """Whole flow forward on a row-sharded field.
    Returns (y_local, logdet (B,)); logdet is psum-reduced when `reduce`,
    else the shard-local contribution."""
    logdet_local = jnp.zeros(x.shape[0], x.dtype)
    for i, p in enumerate(params):
        mu, off = layer_mask_params(i)
        f = lambda pp, h: _link_coupling_forward_sharded(
            pp, h, mu, off, spec, L0, axis_name)
        if remat:
            f = jax.checkpoint(f)
        x, logJ = f(p, x)
        logdet_local = logdet_local + logJ
    if reduce:
        return x, lax.psum(logdet_local, axis_name)
    return x, logdet_local


def _ft_action_local(params, spec, z, beta, L0, axis_name, remat):
    """Shard-local S_eff contribution: sums to the true S_eff over shards.
    This is the differentiation target - taking grad of the psum-REDUCED
    action inside shard_map would overcount by the axis size (the replicated
    cotangent psums back)."""
    y, logdet_local = flow_forward_sharded(params, z, spec, L0, axis_name,
                                           remat=remat, reduce=False)
    local = jnp.sum(jnp.cos(plaq_phase_sharded(y, axis_name)), axis=(1, 2))
    return -beta * local - logdet_local


def ft_action_sharded(params, spec: FlowSpec, z, beta: float, L0: int,
                      axis_name: str, remat: bool = True):
    """S_eff(z) per chain on a row-sharded latent field (fully reduced)."""
    return lax.psum(
        _ft_action_local(params, spec, z, beta, L0, axis_name, remat),
        axis_name)


def ft_force_sharded(params, spec: FlowSpec, z, beta: float, L0: int,
                     axis_name: str, remat: bool = True):
    """dS_eff/dz on the local shard: grad of the LOCAL action contribution;
    cross-shard coupling flows through the ppermute halo exchanges (whose
    transpose is the reverse ppermute)."""
    return jax.grad(lambda zz: jnp.sum(
        _ft_action_local(params, spec, zz, beta, L0, axis_name, remat)))(z)


def _plaq_mean_sharded(y, axis_name):
    local = jnp.sum(jnp.cos(plaq_phase_sharded(y, axis_name)), axis=(1, 2))
    n = y.shape[-2] * y.shape[-1] * lax.axis_size(axis_name)
    return lax.psum(local, axis_name) / n


def _domain_fthmc_step_local(params, key, z, q_old, *, spec: FlowSpec,
                             beta: float, dt: float, nstep: int, L0: int,
                             axis: str, remat: bool = True):
    """One FT-HMC trajectory on the row-sharded latent field (shard-local
    program). Returns (z', q', metrics dict of replicated (B,) arrays)."""
    kv, ka = jax.random.split(key)
    idx = lax.axis_index(axis)
    kv = jax.random.fold_in(kv, idx)
    v0 = jax.random.normal(kv, z.shape, z.dtype)

    y0, logdet0 = flow_forward_sharded(params, z, spec, L0, axis,
                                       remat=remat)
    force = lambda zz: ft_force_sharded(params, spec, zz, beta, L0,
                                        axis, remat=remat)
    zz = z + 0.5 * dt * v0
    v = v0

    def body(carry, _):
        zz, v = carry
        v = v - dt * force(zz)
        zz = zz + dt * v
        return (zz, v), None

    (zz, v), _ = lax.scan(body, (zz, v), None, length=nstep)
    z1 = lattice.wrap(zz - 0.5 * dt * v)

    y1, logdet1 = flow_forward_sharded(params, z1, spec, L0, axis,
                                       remat=remat)
    dsw = -beta * lax.psum(
        jnp.sum(jnp.cos(plaq_phase_sharded(y1, axis))
                - jnp.cos(plaq_phase_sharded(y0, axis)),
                axis=(1, 2)), axis)
    dk = 0.5 * lax.psum(
        jnp.sum(((v - v0) * (v + v0)).reshape(z.shape[0], -1), axis=-1),
        axis)
    dh = dsw - (logdet1 - logdet0) + dk
    u = jax.random.uniform(ka, dh.shape, dh.dtype)
    acc = u < jnp.exp(-dh)
    accb = acc[:, None, None, None]
    z_new = jnp.where(accb, z1, z)
    y_new = jnp.where(accb, y1, y0)
    q_new = topo_charge_sharded(y_new, axis)
    metrics = {
        "dh": dh, "exp_mdh": jnp.exp(-dh), "acc": acc.astype(z.dtype),
        "plaq": _plaq_mean_sharded(y_new, axis), "q": q_new,
        "dq": jnp.abs(q_new - q_old),
    }
    return z_new, q_new, metrics


def make_domain_fthmc_step(mesh: Mesh, spec: FlowSpec, *, beta: float,
                           dt: float, nstep: int, L0: int,
                           axis: str = "rows", remat: bool = True):
    """Full FT-HMC step with the LATTICE ROW axis sharded over `mesh`.

    Returns step(params, key, z, q_old) -> (z', q', (dh, acc)); z placed
    with NamedSharding(mesh, P(None, None, axis, None)), params replicated.
    """
    zspec = P(None, None, axis, None)

    def _step(params, key, z, q_old):
        z, q, m = _domain_fthmc_step_local(
            params, key, z, q_old, spec=spec, beta=beta, dt=dt, nstep=nstep,
            L0=L0, axis=axis, remat=remat)
        return z, q, (m["dh"], m["acc"])

    shard_fn = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P(), P(), zspec, P()),
        out_specs=(zspec, P(), (P(), P())),
        check_vma=False,
    )
    return jax.jit(shard_fn)


@lru_cache(maxsize=None)
def _domain_fthmc_run_fn(mesh: Mesh, axis: str, spec: FlowSpec, beta: float,
                         dt: float, nstep: int, ntraj: int, L0: int,
                         remat: bool):
    """Cached compiled whole-run domain-decomposed FT-HMC scan (mirrors
    mesh._fthmc_run_fn; the cache keeps chunked drivers at ONE compile)."""
    zspec = P(None, None, axis, None)
    mspec = {k: P() for k in ("dh", "exp_mdh", "acc", "plaq", "q", "dq")}

    def local(params, key, z0):
        y0, _ = flow_forward_sharded(params, z0, spec, L0, axis, remat=remat)
        q0 = topo_charge_sharded(y0, axis)

        def body(carry, k):
            z, q = carry
            z, q, m = _domain_fthmc_step_local(
                params, k, z, q, spec=spec, beta=beta, dt=dt, nstep=nstep,
                L0=L0, axis=axis, remat=remat)
            return (z, q), m

        keys = jax.random.split(key, ntraj)
        (z, _), hist = lax.scan(body, (z0, q0), keys)
        return z, hist

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), zspec),
        out_specs=(zspec, mspec), check_vma=False))


def run_domain_fthmc(mesh: Mesh, params, spec: FlowSpec, lf, *, beta: float,
                     ntraj: int, z0, key, axis: str = "rows",
                     remat: bool = True):
    """Whole-run production driver for row-sharded FT-HMC: ntraj
    trajectories as ONE compiled scan with the lattice rows sharded over
    `mesh` and flow params replicated - flowed HMC on lattices larger than
    one chip's HBM (no reference counterpart). Returns (z_final sharded,
    history dict of (ntraj, B) arrays - the TrajMetrics fields)."""
    L0 = z0.shape[-2]
    n_dev = mesh.devices.size
    assert L0 % n_dev == 0, (L0, n_dev)
    z0 = jax.device_put(
        z0, NamedSharding(mesh, P(None, None, axis, None)))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    run = _domain_fthmc_run_fn(mesh, axis, spec, beta, lf.dt, lf.nstep,
                               ntraj, L0, remat)
    return run(params, key, z0)


def run_domain_fthmc_chunked(mesh: Mesh, params, spec: FlowSpec, lf, *,
                             beta: float, ntraj: int, z0, key,
                             block: int = 256, callback=None,
                             axis: str = "rows", remat: bool = True):
    """Chunked domain-decomposed FT-HMC driver (bounded device-run length;
    one compile per block size). Returns (z_final sharded, history dict of
    host numpy (ntraj, B) arrays)."""
    import numpy as np
    blocks = []
    z = z0
    done = 0
    while done < ntraj:
        n = min(block, ntraj - done)
        key, krun = jax.random.split(key)
        z, hist = run_domain_fthmc(mesh, params, spec, lf, beta=beta,
                                   ntraj=n, z0=z, key=krun, axis=axis,
                                   remat=remat)
        jax.block_until_ready(z)
        blocks.append({k: np.asarray(v) for k, v in hist.items()})
        done += n
        if callback is not None:
            callback(done, blocks[-1])
    cat = {k: np.concatenate([b[k] for b in blocks]) for k in blocks[0]}
    return z, cat
